"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` bit-for-bit.

Oracle-generation helper: several catalog entries derive values through
``F.xxhash64`` (kmeans sample selection in ``similarity.kmeans_centroids``,
the synthetic media tables in ``operators/multimodal.py``). Their DuckDB
oracles are GENERATED with those values baked in as literals, which requires
recomputing Spark's hash outside the JVM. This module implements the public
XXH64 algorithm (https://github.com/Cyan4973/xxHash — public spec) exactly
as Spark applies it:

- the seed is 42 unless given;
- each child column's value is hashed with the running hash as the seed
  (``hash = xxh64(child, hash)`` left to right);
- a LONG child hashes its 8 little-endian bytes, an INT child its 4,
  a STRING/BINARY child its raw bytes;
- the result is a SIGNED 64-bit value.

Parity with the JVM is pinned by tests/test_xxh64.py over longs, ints,
strings and the multi-column chaining used in the catalog.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of raw bytes (unsigned result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, struct.unpack_from("<Q", data, i)[0])
            v2 = _round(v2, struct.unpack_from("<Q", data, i + 8)[0])
            v3 = _round(v3, struct.unpack_from("<Q", data, i + 16)[0])
            v4 = _round(v4, struct.unpack_from("<Q", data, i + 24)[0])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = _round(0, struct.unpack_from("<Q", data, i)[0])
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (struct.unpack_from("<I", data, i)[0] * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64(*values, seed: int = 42) -> int:
    """Spark ``F.xxhash64(*cols)`` over Python values (signed result).

    Values are hashed left to right, each seeded with the running hash —
    exactly Spark's multi-child chaining. Type mapping mirrors Spark's
    literal/column types as the catalog uses them: Python int → LONG
    (8 LE bytes) unless wrapped in :class:`Int32` (4 LE bytes, the type of
    a small ``F.lit(i)``); str → utf-8 bytes; bytes → raw.
    """
    h = seed & _M
    for v in values:
        if isinstance(v, Int32):
            h = xxh64_bytes(struct.pack("<i", v.value), h)
        elif isinstance(v, bool):
            raise TypeError("bool child not used by any catalog entry")
        elif isinstance(v, int):
            h = xxh64_bytes(struct.pack("<q", v), h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = xxh64_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported xxhash64 child type: {type(v)!r}")
    return _to_signed(h)


class Int32:
    """Marks a value as a 4-byte INT child (``F.lit(small_int)``)."""

    __slots__ = ("value",)

    def __init__(self, value: int):
        self.value = int(value)


def pmod(v: int, m: int) -> int:
    """Spark ``F.pmod`` over signed ints (non-negative result)."""
    return ((v % m) + m) % m
