"""JVM-expression mirror of the FROZEN ENVELOPE RULES (``envelope.py``).

Whole-stage-codegen'd regexp/HOF expressions; html never leaves the JVM on
the production parse path. Byte/value parity with the Python reference
implementation is pinned by ``tests/test_envelope.py``.
"""

from __future__ import annotations

from functools import lru_cache

from colymer_acquirers_spark import fragments

from pyspark.sql import Column
from pyspark.sql import functions as F

from colymer_acquirers_spark.functions.envelope import (
    EXT_CONTENT_TYPE,
    PAGE_CONTENT_TYPE,
    meta_pattern,
)
from colymer_acquirers_spark.functions.parse import _WS_CLASS, _WS_RE
from colymer_acquirers_spark.functions.parse_expr import (
    _BASE_PARTS_RE,
    _as_str,
    base_parts_expr,
    join_hrefs_array_expr,
)

_WSP = _WS_CLASS + "*"  # optional frozen whitespace
_HEAD_RE = r"(?is)<head\b[^>]*>.*?</head" + _WS_CLASS + r"*>"
_MEDIA_TAG_RE = r"(?is)<(?:img|video|audio)\b[^>]*>"
_TAG_KIND_RE = r"(?is)^<([a-z]+)"
_SRC_D_RE = rf"(?is)\bsrc{_WSP}={_WSP}\"([^\"]*)\""
_SRC_S_RE = rf"(?is)\bsrc{_WSP}={_WSP}'([^']*)'"
_WIDTH_RE = rf"(?is)\bwidth{_WSP}={_WSP}[\"']?(\d+)"
_HEIGHT_RE = rf"(?is)\bheight{_WSP}={_WSP}[\"']?(\d+)"
_EXT_RE = r"\.([A-Za-z0-9]{1,5})$"


def _nullif_empty(c: Column) -> Column:
    return F.when(c == "", F.lit(None).cast("string")).otherwise(c)


def _head_expr(s: Column) -> Column:
    """FROZEN RULE 7 span — also the search scope for rules 1-3 and 6.

    Appears as an identical subtree under every meta field of
    ``envelope_expr``; Spark's subexpression elimination evaluates it once
    per row, so the envelope costs ONE full-document scan for the head
    plus per-meta scans over the (typically hundreds-of-bytes) head span —
    v1 did 8 full-document scans here."""
    return _nullif_empty(F.regexp_extract(s, _HEAD_RE, 0))


def _meta_expr(head: Column, attr: str, name: str) -> Column:
    """FROZEN RULES 1-3/6 lookup over the head span: double-quoted content
    wins over single."""
    d = F.regexp_extract(head, meta_pattern(attr, name, True), 1)
    sg = F.regexp_extract(head, meta_pattern(attr, name, False), 1)
    return F.coalesce(_nullif_empty(d), _nullif_empty(sg))


def _clean_expr(c: Column) -> Column:
    for ent, rep in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return _nullif_empty(F.trim(F.regexp_replace(c, _WS_RE, " ")))


def extract_author_expr(html: Column | str, is_binary: bool = True) -> Column:
    s = F.col(html) if isinstance(html, str) else html
    if is_binary:
        s = _as_str(s)
    return _clean_expr(
        F.coalesce(_meta_expr(_head_expr(s), "name", "author"), F.lit(""))
    )


def extract_author_id_expr(html: Column | str, is_binary: bool = True) -> Column:
    s = F.col(html) if isinstance(html, str) else html
    if is_binary:
        s = _as_str(s)
    return _clean_expr(
        F.coalesce(_meta_expr(_head_expr(s), "name", "author-id"), F.lit(""))
    )


def extract_published_expr(html: Column | str, is_binary: bool = True) -> Column:
    """FROZEN RULE 3: strict ``yyyy-mm-ddThh:mm:ssZ`` → timestamp else NULL.

    try_to_timestamp (not to_timestamp): the rlike pre-filter only checks
    digit SHAPE, so calendar-invalid values (month 13, hour 25) reach the
    parse — try_to_timestamp yields NULL for them in BOTH ANSI modes,
    matching the Python oracle's try/except (ANSI-on plain to_timestamp
    would throw; the driver's session runs ANSI-on)."""
    s = F.col(html) if isinstance(html, str) else html
    if is_binary:
        s = _as_str(s)
    raw = _meta_expr(_head_expr(s), "property", "article:published_time")
    ok = raw.rlike(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")
    return F.when(
        ok, F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))
    ).otherwise(F.lit(None).cast("timestamp"))


def extract_version_expr(html: Column | str, is_binary: bool = True) -> Column:
    """FROZEN RULE 6: 1-9-digit ``<meta name="version">`` → int else NULL
    (digits-only rlike makes the cast ANSI-safe; ≤9 digits < 2^31)."""
    s = F.col(html) if isinstance(html, str) else html
    if is_binary:
        s = _as_str(s)
    raw = _meta_expr(_head_expr(s), "name", "version")
    return F.when(raw.rlike(r"^\d{1,9}$"), raw.cast("int")).otherwise(
        F.lit(None).cast("int")
    )


def extract_original_data_expr(html: Column | str, is_binary: bool = True) -> Column:
    """FROZEN RULE 7: verbatim head section (raw-record passthrough) or
    NULL. regexp_extract group 0 can never be the empty string here (a
    match always contains ``<head``), so nullif-empty is exact."""
    s = F.col(html) if isinstance(html, str) else html
    if is_binary:
        s = _as_str(s)
    return _head_expr(s)


def _ext_map() -> Column:
    pairs = []
    for k, v in EXT_CONTENT_TYPE.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


def page_content_type_expr(url: Column | str) -> Column:
    """FROZEN RULE 4 ladder over the (canonical) url.

    try_element_at on the extension map: ANSI-on element_at throws
    MAP_KEY_DOES_NOT_EXIST for unknown extensions — the ladder's fallback
    to octet-stream RELIES on a NULL lookup, so the try_ variant is the
    only mode-stable spelling. Explicit NULL-url guard: without it the
    null scheme nulls the outer when-condition and the ladder's coalesce
    would emit 'application/octet-stream' where the Python oracle
    (page_content_type_one) returns None."""
    u = F.col(url) if isinstance(url, str) else url
    strip_re = "^" + _WS_CLASS + "+|" + _WS_CLASS + "+$"
    ut = F.regexp_replace(u, strip_re, "")
    scheme = F.lower(F.regexp_extract(ut, _BASE_PARTS_RE, 1))
    raw_path = F.regexp_extract(ut, _BASE_PARTS_RE, 3)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    path = F.element_at(
        F.split(F.element_at(F.split(path, "[?]", 2), 1), "#", 2), 1
    )
    filename = F.element_at(F.split(path, "/"), -1)
    ext = F.lower(F.regexp_extract(filename, _EXT_RE, 1))
    page_pairs = []
    for k, v in PAGE_CONTENT_TYPE.items():
        page_pairs.extend([F.lit(k), F.lit(v)])
    ladder = (
        F.when(ext == "", F.lit("text/html"))
        .otherwise(
            F.coalesce(
                F.try_element_at(F.create_map(*page_pairs), ext),
                F.lit("application/octet-stream"),
            )
        )
    )
    return F.when(
        u.isNull() | (scheme == ""), F.lit(None).cast("string")
    ).otherwise(ladder)


def extract_attachments_expr(
    html: Column | str, base_url: Column | str, is_binary: bool = True
) -> Column:
    """FROZEN RULE 5 as HOF array expressions: array<ATTACHMENT-shaped
    struct> in document order."""
    s = F.col(html) if isinstance(html, str) else html
    if is_binary:
        s = _as_str(s)
    base = F.col(base_url) if isinstance(base_url, str) else base_url
    scheme, host, base_dir = base_parts_expr(base)

    tags = F.regexp_extract_all(s, F.lit(_MEDIA_TAG_RE), F.lit(0))

    # PERF NOTE (r5): higher-order-function lambdas are evaluated
    # interpreted and get NO common-subexpression elimination — a Column
    # referenced twice is a full copy of its expression tree, evaluated
    # twice per element. The original one-lambda build referenced
    # ``abs_url`` (which embeds join_href_expr's path-normalize aggregate)
    # through the clean→path→filename→ext chain ~8×, costing ~586 µs/URL;
    # staging each expensive value ONCE into a struct field and referencing
    # the field afterwards is byte-identical and ~5× cheaper. Stages are
    # chained transforms over the (≤ handful)-element tag array.
    def stage_src(tag: Column) -> Column:
        return F.struct(
            tag.alias("tag"),
            F.coalesce(
                _nullif_empty(F.regexp_extract(tag, _SRC_D_RE, 1)),
                _nullif_empty(F.regexp_extract(tag, _SRC_S_RE, 1)),
            ).alias("src"),
        )

    def stage_abs(srcs: Column) -> Column:
        # array-level staged join (null src → null abs passes through)
        return join_hrefs_array_expr(srcs, scheme, host, base_dir)

    def stage_name(x: Column) -> Column:
        abs_url = x["abs"]
        clean = F.element_at(
            F.split(F.element_at(F.split(abs_url, "[?]", 2), 1), "#", 2), 1
        )
        path = F.regexp_extract(clean, _BASE_PARTS_RE, 3)
        path = F.when(path == "", F.lit("/")).otherwise(path)
        return F.struct(
            x["tag"].alias("tag"),
            abs_url.alias("abs"),
            F.element_at(F.split(path, "/"), -1).alias("filename"),
            F.md5(F.encode(abs_url, "utf-8")).alias("att_id"),
        )

    def stage_ext(x: Column) -> Column:
        return F.struct(
            x["tag"].alias("tag"),
            x["abs"].alias("abs"),
            x["filename"].alias("filename"),
            x["att_id"].alias("att_id"),
            F.lower(F.regexp_extract(x["filename"], _EXT_RE, 1)).alias("ext"),
        )

    def build(x: Column) -> Column:
        tag, abs_url = x["tag"], x["abs"]
        filename, att_id, ext = x["filename"], x["att_id"], x["ext"]
        kind = F.lower(F.regexp_extract(tag, _TAG_KIND_RE, 1))
        # try_element_at: unknown extensions must fall through the coalesce
        # as NULL, not throw MAP_KEY_DOES_NOT_EXIST under ANSI-on sessions
        ctype = F.when(
            ext == "", F.concat(kind, F.lit("/unknown"))
        ).otherwise(
            F.coalesce(
                F.try_element_at(_ext_map(), ext),
                F.concat(kind, F.lit("/unknown")),
            )
        )
        width = _nullif_empty(F.regexp_extract(tag, _WIDTH_RE, 1)).cast("int")
        height = _nullif_empty(F.regexp_extract(tag, _HEIGHT_RE, 1)).cast("int")
        return F.struct(
            att_id.alias("id"),
            filename.alias("filename"),
            ctype.alias("content_type"),
            abs_url.alias("original_url"),
            F.struct(
                width.alias("width"),
                height.alias("height"),
                F.lit(None).cast("long").alias("duration_millis"),
                F.lit(None).cast("long").alias("size"),
                F.lit(None).cast("long").alias("bitrate"),
                F.lit(None).cast("string").alias("quality"),
            ).alias("metadata"),
            F.struct(
                F.lit(True).alias("directly_transfer"),
                F.when(
                    ext == "", att_id
                ).otherwise(F.concat(att_id, F.lit("."), ext)).alias("path"),
                base.alias("referer"),
            ).alias("persist_info"),
        )

    t1 = F.transform(tags, stage_src)
    abss = stage_abs(F.transform(t1, lambda x: x["src"]))
    t2 = F.zip_with(
        t1,
        abss,
        lambda x, a: F.struct(x["tag"].alias("tag"), a.alias("abs")),
    )
    built = F.transform(
        F.transform(F.transform(t2, stage_name), stage_ext), build
    )
    kept = F.filter(built, lambda a: a["original_url"].isNotNull())
    empty = F.array().cast(
        "array<struct<id:string,filename:string,content_type:string,"
        "original_url:string,"
        "metadata:struct<width:int,height:int,duration_millis:bigint,"
        "size:bigint,bitrate:bigint,quality:string>,"
        "persist_info:struct<directly_transfer:boolean,path:string,"
        "referer:string>>>"
    )
    return F.when(s.isNull() | base.isNull() | (scheme == ""), empty).otherwise(kept)


def envelope_expr(
    html: Column | str, base_url: Column | str, is_binary: bool = True
) -> Column:
    """struct<author_id, author_name, published, version, original_data,
    attachments> in one pass.

    By-name form memoized (same rationale as ``parse_page_expr``: large
    identical tree every round; unresolved Columns are reusable)."""
    if isinstance(html, str) and isinstance(base_url, str):
        return _envelope_expr_cached(html, base_url, is_binary)
    return _envelope_expr(html, base_url, is_binary)


@fragments.register
@lru_cache(maxsize=32)
def _envelope_expr_cached(html: str, base_url: str, is_binary: bool) -> Column:
    return _envelope_expr(F.col(html), F.col(base_url), is_binary)


def _envelope_expr(html: Column, base_url: Column, is_binary: bool) -> Column:
    h = html
    if is_binary:
        h = _as_str(h)
    b = base_url
    return F.struct(
        extract_author_id_expr(h, is_binary=False).alias("author_id"),
        extract_author_expr(h, is_binary=False).alias("author_name"),
        extract_published_expr(h, is_binary=False).alias("published"),
        extract_version_expr(h, is_binary=False).alias("version"),
        extract_original_data_expr(h, is_binary=False).alias("original_data"),
        extract_attachments_expr(h, b, is_binary=False).alias("attachments"),
    )
