"""Frozen article-envelope extraction — Python reference implementation.

Generalizes the reference's per-platform envelope builders to HTML pages:
author (``colymer/acquirers/weibo.py:218-221``, ``twitter.py:89-91``),
publish time (``weibo.py:223``, ``twitter.py:92``), content-type ladder
(``weibo.py:205-213``), and the attachment descriptor built identically in
7 reference sites (``weibo.py:33-47,62-81,96-111,114-130,133-149``,
``instagram.py:15-42``, ``twitter.py:16-60``) — media is carried as typed
metadata + URL, never decoded.

These scalar/series functions are the byte-identity oracle shared with
``pyref``; the production plan uses the JVM-expression mirrors in
``envelope_expr.py`` (parity pinned by tests/test_envelope.py).

FROZEN ENVELOPE RULES — v2 (rules 1-3 and 6 are scoped to the HEAD
SECTION, i.e. exactly the span rule 7 preserves as ``original_data``):
 1. AUTHOR_NAME : first ``<meta name="author"    content="...">`` in the
    head section (ci; name may be single- or double-quoted; content
    double-quoted wins over single-quoted) → entity-decode, ws-collapse,
    strip; empty or no head → NULL
 2. AUTHOR_ID   : same with ``name="author-id"``
 3. PUBLISHED   : first ``<meta property="article:published_time"
    content="...">`` in the head section; value must be exactly
    ``yyyy-mm-ddThh:mm:ssZ`` (frozen to the UTC 'Z' form) → timestamp,
    else NULL
 4. PAGE CONTENT_TYPE (by url extension ladder, P13):
    html|htm → text/html; txt → text/plain; json → application/json;
    xml → application/xml; no extension → text/html;
    anything else → application/octet-stream
 5. ATTACHMENTS : ``<img|video|audio ...>`` tags in document order; src
    (double-quoted wins over single-quoted; empty → skip) absolutized by
    the FROZEN LINK RULE; per attachment:
      id           = md5 hex of the absolute url
      filename     = last path segment (query/fragment stripped)
      content_type = by extension (jpg|jpeg→image/jpeg, png→image/png,
                     gif→image/gif, webp→image/webp, mp4→video/mp4,
                     webm→video/webm, mp3→audio/mpeg, ogg→audio/ogg,
                     wav→audio/wav), else "<tag>/unknown"
      metadata     = width/height from integer attrs when present
      persist_info = directly_transfer=true, path=id[.ext], referer=base
 6. VERSION     : first ``<meta name="version" content="...">`` in the
    head section (same quoting precedence as rules 1-2); content must be
    1-9 ASCII digits → int, else NULL (reference ``edit_count``,
    weibo.py:230-231,276-277)
 7. ORIGINAL_DATA: the page's head section — the first
    ``<head ...> ... </head>`` span preserved VERBATIM (the reference's
    ``metadata.original_data`` raw-record passthrough, weibo.py:222-231,
    twitter.py:98-102: carry the envelope's source bytes so fields are
    re-derivable post-hoc); no head → NULL. Body-side media tags are
    already carried verbatim via attachments.original_url.

RULE VERSION NOTE (v1 → v2): v1's meta rules 1-3 searched the WHOLE
document. v2 scopes them (and rule 6) to the head section, which (a) makes
the envelope self-consistent — every meta-derived field is re-derivable
from the ``original_data`` passthrough alone, the property rule 7 exists
for; (b) matches the HTML spec (meta elements belong in head); and (c)
turns 8 full-document regex scans per page (4 metas × 2 quoting passes)
into 1 head-extract plus 8 scans over a span that is typically hundreds of
bytes — the envelope path is memory-bandwidth-bound at high core counts,
so full-document passes are the scarce resource. Divergence vs v1 only
for meta tags OUTSIDE the head (invalid HTML): now NULL. No golden hashes
were persisted under v1 (pyref regenerates them and shares these
functions); tests/test_envelope.py pins the v2 values including the
outside-head case.
"""

from __future__ import annotations

import hashlib
import re
from datetime import datetime, timezone

import pandas as pd

from colymer_acquirers_spark.functions.parse import (
    _BASE_RE,
    _WS_CLASS,
    _WS_RE,
    _decode_series,
    _join_url,
    _to_str_series,
)

_WSP = _WS_CLASS + "*"  # optional frozen whitespace run


def meta_pattern(attr: str, name: str, double_quoted: bool) -> str:
    """Regex source for FROZEN RULES 1-3, shared verbatim with the JVM
    mirror (Java-regex-compatible). A double-quoted content match anywhere
    wins over a single-quoted one (two passes — expressible as two
    regexp_extract + coalesce on the JVM)."""
    q = f"[\"']{name}[\"']"
    content = "\"([^\"]*)\"" if double_quoted else "'([^']*)'"
    return (
        rf"(?is)<meta\b[^>]*\b{attr}{_WSP}={_WSP}{q}[^>]*"
        rf"\bcontent{_WSP}={_WSP}{content}"
    )


def _meta_res(attr: str, name: str) -> tuple[re.Pattern, re.Pattern]:
    return (
        re.compile(meta_pattern(attr, name, True)),
        re.compile(meta_pattern(attr, name, False)),
    )


_AUTHOR_RE = _meta_res("name", "author")
_AUTHOR_ID_RE = _meta_res("name", "author-id")
_PUBLISHED_RE = _meta_res("property", "article:published_time")
_VERSION_RE = _meta_res("name", "version")
_ISO_Z_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")
_VERSION_INT_RE = re.compile(r"^\d{1,9}$")
_HEAD_RE = re.compile(r"(?is)<head\b[^>]*>.*?</head" + _WS_CLASS + r"*>")
_MEDIA_TAG_RE = re.compile(r"(?is)<(img|video|audio)\b[^>]*>")
_SRC_D_RE = re.compile(rf"(?is)\bsrc{_WSP}={_WSP}\"([^\"]*)\"")
_SRC_S_RE = re.compile(rf"(?is)\bsrc{_WSP}={_WSP}'([^']*)'")
_WIDTH_RE = re.compile(rf"(?is)\bwidth{_WSP}={_WSP}[\"']?(\d+)")
_HEIGHT_RE = re.compile(rf"(?is)\bheight{_WSP}={_WSP}[\"']?(\d+)")
_EXT_RE = re.compile(r"\.([A-Za-z0-9]{1,5})$")

EXT_CONTENT_TYPE = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "webp": "image/webp",
    "mp4": "video/mp4",
    "webm": "video/webm",
    "mp3": "audio/mpeg",
    "ogg": "audio/ogg",
    "wav": "audio/wav",
}

PAGE_CONTENT_TYPE = {
    "html": "text/html",
    "htm": "text/html",
    "txt": "text/plain",
    "json": "application/json",
    "xml": "application/xml",
}


def _meta_first(html: str, pats: tuple[re.Pattern, re.Pattern]) -> str | None:
    for pat in pats:  # double-quoted content wins over single-quoted
        m = pat.search(html)
        if m and m.group(1) != "":
            return m.group(1)
    return None


def _clean_series(s: pd.Series) -> pd.Series:
    s = _decode_series(s.fillna(""))
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s.where(s != "", None)


def _head_one(h: str | None) -> str | None:
    if h is None:
        return None
    m = _HEAD_RE.search(h)
    return m.group(0) if m else None


def _meta_series(html: pd.Series, pat: re.Pattern, clean: bool) -> pd.Series:
    # v2: meta rules search the head section only (see RULE VERSION NOTE)
    s = _to_str_series(html).astype("object")
    out = s.map(
        lambda h: _meta_first(hd, pat) if (hd := _head_one(h)) is not None else None
    )
    if clean:
        return _clean_series(out)
    return out


def extract_author_series(html: pd.Series) -> pd.Series:
    """FROZEN RULE 1 (vectorized)."""
    return _meta_series(html, _AUTHOR_RE, clean=True)


def extract_author_id_series(html: pd.Series) -> pd.Series:
    """FROZEN RULE 2 (vectorized)."""
    return _meta_series(html, _AUTHOR_ID_RE, clean=True)


def extract_published_series(html: pd.Series) -> pd.Series:
    """FROZEN RULE 3 (vectorized): UTC datetimes or None."""
    raw = _meta_series(html, _PUBLISHED_RE, clean=False)

    def parse(v):
        if v is None or not _ISO_Z_RE.match(v):
            return None
        # the shape regex admits calendar-invalid values (month 13, day 32,
        # hour 25); the JVM mirror's try_to_timestamp yields NULL for those,
        # so the frozen rule is "calendar-invalid → NULL" in every impl
        try:
            return datetime.strptime(v, "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
        except ValueError:
            return None

    # explicit object dtype: pandas would otherwise coerce to datetime64 and
    # silently turn None into NaT (breaking the None-vs-value contract)
    return pd.Series(
        [parse(v) for v in raw], index=raw.index, dtype="object"
    )


def extract_version_series(html: pd.Series) -> pd.Series:
    """FROZEN RULE 6 (vectorized): int versions or None."""
    raw = _meta_series(html, _VERSION_RE, clean=False)
    return pd.Series(
        [
            int(v) if v is not None and _VERSION_INT_RE.match(v) else None
            for v in raw
        ],
        index=raw.index,
        dtype="object",
    )


def extract_original_data_series(html: pd.Series) -> pd.Series:
    """FROZEN RULE 7 (vectorized): verbatim head section or None."""
    return _to_str_series(html).astype("object").map(_head_one)


def page_content_type_one(url: str | None) -> str | None:
    """FROZEN RULE 4 over the canonical url."""
    if url is None:
        return None
    m = _BASE_RE.match(url.strip())
    if not m:
        return None
    path = (m.group(3) or "/").split("?", 1)[0].split("#", 1)[0]
    filename = path.rsplit("/", 1)[-1]
    em = _EXT_RE.search(filename)
    if not em:
        return "text/html"
    return PAGE_CONTENT_TYPE.get(em.group(1).lower(), "application/octet-stream")


def _filename_of(abs_url: str) -> str:
    m = _BASE_RE.match(abs_url)
    path = (m.group(3) or "/") if m else "/"
    return path.rsplit("/", 1)[-1]


def extract_attachments_one(
    html: str | bytes | None, base_url: str | None
) -> list[dict]:
    """FROZEN RULE 5 (scalar; shared with pyref)."""
    if html is None or base_url is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", "replace")
    m = _BASE_RE.match(base_url.strip())
    if not m:
        return []
    scheme, host, path = m.group(1).lower(), m.group(2).lower(), m.group(3) or "/"
    base_dir = path[: path.rfind("/") + 1] or "/"
    out: list[dict] = []
    for tm in _MEDIA_TAG_RE.finditer(html):
        tag, kind = tm.group(0), tm.group(1).lower()
        sd = _SRC_D_RE.search(tag)
        src = sd.group(1) if sd else None
        if not src:
            ss = _SRC_S_RE.search(tag)
            src = ss.group(1) if ss else None
        if not src:
            continue
        abs_url = _join_url(scheme, host, base_dir, src)
        if abs_url is None:
            continue
        filename = _filename_of(abs_url.split("?", 1)[0].split("#", 1)[0])
        em = _EXT_RE.search(filename)
        ext = em.group(1).lower() if em else None
        ctype = EXT_CONTENT_TYPE.get(ext, f"{kind}/unknown")
        att_id = hashlib.md5(abs_url.encode()).hexdigest()
        wm = _WIDTH_RE.search(tag)
        hm = _HEIGHT_RE.search(tag)
        out.append(
            {
                "id": att_id,
                "filename": filename,
                "content_type": ctype,
                "original_url": abs_url,
                "metadata": {
                    "width": int(wm.group(1)) if wm else None,
                    "height": int(hm.group(1)) if hm else None,
                    "duration_millis": None,
                    "size": None,
                    "bitrate": None,
                    "quality": None,
                },
                "persist_info": {
                    "directly_transfer": True,
                    "path": att_id + (f".{ext}" if ext else ""),
                    "referer": base_url,
                },
            }
        )
    return out


