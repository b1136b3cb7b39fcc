"""Cuckoo-filter URL-seen shards — the DELETE-capable sibling of
``seen_bloom`` (north_rule names "bloom/cuckoo URL-seen"; the reference
analog is the same chain-block seen structure, ``colymer/acquirers/
acquirer.py:10-22``, which *shrinks* when blocks are spliced — a bloom
cannot forget, a cuckoo filter can).

Same sharding and probe contract as ``BloomSeen``: salted full-URL hash →
shard, per-shard filter built/probed in numpy over Arrow batches,
"definitely unseen" / "maybe seen" with an exact backstop downstream.
Differences:

- per-shard state = ``n_buckets × 4`` slots of 16-bit fingerprints plus an
  exact STASH of the rare items whose insertion exceeded the kick budget —
  the stash keeps the no-false-negative invariant unconditional instead of
  "with high probability".
- ``delete_urls`` removes fingerprints (bucket slot or stash). Standard
  cuckoo caveat: only delete urls that were actually inserted — deleting a
  never-inserted url can strip another url's colliding fingerprint.
- FPR ≈ 2·slots / 2^16 ≈ 1.2e-4 at ≤95% occupancy (fingerprint size is
  fixed at 16 bits; capacity sizing is therefore purely geometric).

Everything is deterministic: hashing is xxhash64 (JVM-side), insertion
order is the sorted Arrow batch order, and evictions kick the slot chosen
by a counter-based rotation — no RNG anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("table", T.BinaryType(), False),  # uint16 LE slots
        T.StructField("stash", T.BinaryType(), False),  # int64 LE url-hashes
        T.StructField("n_items", T.LongType(), False),
        T.StructField("n_shards", T.IntegerType(), False),
        T.StructField("n_buckets", T.IntegerType(), False),
        T.StructField("slots", T.IntegerType(), False),
    ]
)

_SLOTS = 4
_MAX_KICKS = 96


def _with_hashes(df: DataFrame, n_shards: int) -> DataFrame:
    c = F.col("canonical_url")
    return (
        df.withColumn("__shard", F.pmod(F.hash(c), F.lit(n_shards)).cast("int"))
        .withColumn("__h", F.xxhash64(c))
    )


def _fp_and_buckets(h: np.ndarray, n_buckets: int):
    """(fingerprint, i1, i2) per item from the 64-bit url hash.

    fp ∈ [1, 65535] (0 = empty slot); i2 = i1 XOR spread(fp) — the partner
    relation is an involution, so lookup/insert may use either index."""
    hu = h.astype(np.uint64)
    fp = ((hu >> np.uint64(48)) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
    i1 = (hu % np.uint64(n_buckets)).astype(np.int64)
    spread = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(n_buckets)
    i2 = (i1 ^ spread.astype(np.int64)) % n_buckets
    return fp, i1, i2


def _partner(i: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    spread = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(n_buckets)
    return (i ^ spread.astype(np.int64)) % n_buckets


class CuckooSeen:
    SCHEMA = CUCKOO_SCHEMA  # shard-table schema (crawl loop reads via this)

    def __init__(
        self,
        n_shards: int = 32,
        n_buckets: int = 1 << 12,
        slots: int = _SLOTS,
    ):
        if n_buckets <= 0 or n_buckets & (n_buckets - 1):
            # the partner relation i2 = (i1 ^ spread) % n_buckets is an
            # involution only for power-of-two geometries; anything else
            # silently loses kicked fingerprints (false negatives that
            # bypass the exact backstop)
            raise ValueError(
                f"n_buckets must be a power of two, got {n_buckets}"
            )
        self.n_shards = n_shards
        self.n_buckets = n_buckets
        self.slots = slots

    @classmethod
    def sized(
        cls,
        expected_items: int,
        occupancy: float = 0.9,
        max_shard_bytes: int = 1 << 26,
    ) -> "CuckooSeen":
        """Geometry from expected load: slots·n_buckets·n_shards ≥ n/occ,
        shards capped at ``max_shard_bytes`` (2 bytes/slot)."""
        n = max(1, int(expected_items))
        total_slots = int(np.ceil(n / occupancy))
        slots_per_shard_cap = max_shard_bytes // 2
        n_shards = max(1, int(np.ceil(total_slots / slots_per_shard_cap)))
        per_shard = int(np.ceil(total_slots / n_shards / _SLOTS))
        n_buckets = 1 << max(4, int(np.ceil(np.log2(max(per_shard, 1)))))
        return cls(n_shards=n_shards, n_buckets=n_buckets)

    def params(self) -> dict:
        return {
            "n_shards": self.n_shards,
            "n_buckets": self.n_buckets,
            "slots": self.slots,
        }

    @classmethod
    def from_table(cls, shards: DataFrame) -> "CuckooSeen | None":
        row = shards.select("n_shards", "n_buckets", "slots").first()
        if row is None:
            return None
        return cls(row["n_shards"], row["n_buckets"], row["slots"])

    # -- kernels (numpy, per shard) ---------------------------------------
    def _insert_all(self, table: np.ndarray, hashes: np.ndarray) -> list[int]:
        """Insert every hash; returns the url-hashes that overflowed to the
        stash. ``table`` is (n_buckets, slots) uint16, mutated in place."""
        nb = self.n_buckets
        fp, i1, _ = _fp_and_buckets(hashes, nb)
        stash: list[int] = []
        for k in range(len(hashes)):
            f, i = np.uint16(fp[k]), int(i1[k])
            placed = False
            for kick in range(_MAX_KICKS):
                row = table[i]
                free = np.flatnonzero(row == 0)
                if len(free):
                    row[free[0]] = f
                    placed = True
                    break
                alt = int(_partner(np.int64(i), f, nb))
                arow = table[alt]
                afree = np.flatnonzero(arow == 0)
                if len(afree):
                    arow[afree[0]] = f
                    placed = True
                    break
                # deterministic eviction: rotate the victim slot by kick count
                victim = kick % self.slots
                f, table[i][victim] = table[i][victim], f
                i = int(_partner(np.int64(i), f, nb))
            if not placed:
                # the pending entry after ≥1 eviction is some VICTIM's
                # fingerprint (the original item took the victim's slot in
                # the first swap) — its url-hash is unknown, so it stashes
                # as a fingerprint-only entry (negative sentinel; probe
                # matches those by fingerprint). Stashing the original
                # url-hash here would silently false-drop the victim.
                stash.append(-int(f))
        return stash

    def _contains(
        self, table: np.ndarray, stash: np.ndarray, hashes: np.ndarray
    ) -> np.ndarray:
        nb = self.n_buckets
        fp, i1, i2 = _fp_and_buckets(hashes, nb)
        hit1 = (table[i1] == fp[:, None]).any(axis=1)
        hit2 = (table[i2] == fp[:, None]).any(axis=1)
        in_stash = np.isin(hashes, stash) if len(stash) else np.zeros(
            len(hashes), dtype=bool
        )
        return hit1 | hit2 | in_stash

    # -- build -------------------------------------------------------------
    def build_delta(self, urls: DataFrame) -> DataFrame:
        nb, sl, ns = self.n_buckets, self.slots, self.n_shards

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            table = np.zeros((nb, sl), dtype=np.uint16)
            hashes = np.sort(pdf["__h"].to_numpy(np.int64))  # order-stable
            stash = self._insert_all(table, hashes)
            return pd.DataFrame(
                {
                    "shard": [int(pdf["__shard"].iloc[0])],
                    "table": [table.tobytes()],
                    "stash": [np.asarray(stash, dtype=np.int64).tobytes()],
                    "n_items": [len(pdf)],
                    "n_shards": [ns],
                    "n_buckets": [nb],
                    "slots": [sl],
                }
            )

        return (
            _with_hashes(urls.select("canonical_url"), ns)
            .groupBy("__shard")
            .applyInPandas(build, CUCKOO_SCHEMA)
        )

    def merge(self, shards: DataFrame) -> DataFrame:
        """Union per shard: keep the fullest table, re-insert the other
        tables' occupied fingerprints at their stored-or-partner index
        (either keeps the lookup invariant), union stashes."""
        nb, sl, ns = self.n_buckets, self.slots, self.n_shards

        def orit(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf["n_buckets"].nunique() != 1 or pdf["slots"].nunique() != 1:
                raise ValueError("cuckoo merge across mismatched geometries")
            tables = [
                np.frombuffer(b, dtype=np.uint16).reshape(nb, sl).copy()
                for b in pdf["table"]
            ]
            stashes = [np.frombuffer(b, dtype=np.int64) for b in pdf["stash"]]
            main = max(range(len(tables)), key=lambda i: (tables[i] != 0).sum())
            table = tables[main]
            stash = list(stashes[main])
            for j, other in enumerate(tables):
                if j == main:
                    continue
                stash.extend(stashes[j])
                buckets, slot_idx = np.nonzero(other)
                for i, s in zip(buckets, slot_idx):
                    f = other[i, s]
                    placed = False
                    for idx in (int(i), int(_partner(np.int64(i), f, nb))):
                        row = table[idx]
                        if (row == f).any():
                            placed = True
                            break
                        free = np.flatnonzero(row == 0)
                        if len(free):
                            row[free[0]] = f
                            placed = True
                            break
                    if not placed:
                        # no fp-only kick path across tables: stash exactly.
                        # negative sentinel marks fp-only entries; lookups
                        # match on fingerprint for these
                        stash.append(-int(f))
            return pd.DataFrame(
                {
                    "shard": [int(pdf["shard"].iloc[0])],
                    "table": [table.tobytes()],
                    "stash": [np.asarray(sorted(set(stash)), dtype=np.int64).tobytes()],
                    "n_items": [int(pdf["n_items"].sum())],
                    "n_shards": [ns],
                    "n_buckets": [nb],
                    "slots": [sl],
                }
            )

        return shards.groupBy("shard").applyInPandas(orit, CUCKOO_SCHEMA)

    # -- probe -------------------------------------------------------------
    def probe(self, frontier: DataFrame, shards: DataFrame) -> DataFrame:
        """frontier + boolean ``maybe_seen`` (same contract as BloomSeen:
        False ⇒ definitely unseen; True ⇒ confirm via exact anti-join)."""
        nb, sl = self.n_buckets, self.slots
        fr = _with_hashes(frontier, self.n_shards)
        keep = [c for c in fr.columns if not c.startswith("__")]
        out_schema = T.StructType(
            [f for f in fr.schema.fields if not f.name.startswith("__")]
            + [T.StructField("maybe_seen", T.BooleanType(), False)]
        )

        def check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0:
                return pd.DataFrame(columns=keep + ["maybe_seen"])
            out = left[keep].copy()
            if len(right) == 0:
                out["maybe_seen"] = False
                return out
            hashes = left["__h"].to_numpy(np.int64)
            maybe = np.zeros(len(left), dtype=bool)
            for _, r in right.iterrows():
                table = np.frombuffer(r["table"], dtype=np.uint16).reshape(nb, sl)
                stash_all = np.frombuffer(r["stash"], dtype=np.int64)
                stash = stash_all[stash_all >= 0]
                fp_stash = (-stash_all[stash_all < 0]).astype(np.uint16)
                maybe |= self._contains(table, stash, hashes)
                if len(fp_stash):
                    fp, _, _ = _fp_and_buckets(hashes, nb)
                    maybe |= np.isin(fp, fp_stash)
            out["maybe_seen"] = maybe
            return out

        return (
            fr.groupby("__shard")
            .cogroup(shards.groupby("shard"))
            .applyInPandas(lambda left, right: check(left, right), out_schema)
        )

    # -- delete ------------------------------------------------------------
    def delete_urls(self, shards: DataFrame, urls: DataFrame) -> DataFrame:
        """Remove the given urls' fingerprints (ONE slot match per url —
        the cuckoo-filter delete). Only delete urls that were inserted;
        deleting strangers can evict a colliding fingerprint (documented
        cuckoo semantics). Returns the updated shard table."""
        nb, sl, ns = self.n_buckets, self.slots, self.n_shards

        def drop(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(right) == 0:
                return pd.DataFrame(columns=[f.name for f in CUCKOO_SCHEMA.fields])
            r = right.iloc[0]
            table = np.frombuffer(r["table"], dtype=np.uint16).reshape(nb, sl).copy()
            stash = list(np.frombuffer(r["stash"], dtype=np.int64))
            n = int(r["n_items"])
            if len(left):
                hashes = left["__h"].to_numpy(np.int64)
                fp, i1, i2 = _fp_and_buckets(hashes, nb)
                for k in range(len(hashes)):
                    h = int(hashes[k])
                    if h in stash:
                        stash.remove(h)
                        n -= 1
                        continue
                    f = fp[k]
                    removed = False
                    for i in (int(i1[k]), int(i2[k])):
                        s = np.flatnonzero(table[i] == f)
                        if len(s):
                            table[i][s[0]] = 0
                            removed = True
                            break
                    if removed:
                        n -= 1
            return pd.DataFrame(
                {
                    "shard": [int(r["shard"])],
                    "table": [table.tobytes()],
                    "stash": [np.asarray(stash, dtype=np.int64).tobytes()],
                    "n_items": [max(n, 0)],
                    "n_shards": [ns],
                    "n_buckets": [nb],
                    "slots": [sl],
                }
            )

        keyed = _with_hashes(urls.select("canonical_url"), ns)
        return (
            keyed.groupby("__shard")
            .cogroup(shards.groupby("shard"))
            .applyInPandas(lambda left, right: drop(left, right), CUCKOO_SCHEMA)
        )
