"""URL canonicalization for web-capture resolution (pure codegen).

Common-Crawl-style pipelines dedup captures by *canonical* URL before
any content-level dedup: the same page is fetched many times under
trivially-different URLs (fragment anchors, tracking parameters,
http/https, a leading ``www.``, a trailing slash) and at many
``warc_ts`` capture times. The canonicalizer here implements the
standard normalization set (RFC 3986 case rules for scheme/host +
the usual crawl-dedup extensions):

1. strip the fragment (``#...``),
2. lowercase scheme+host only (path case is significant per RFC 3986
   and is preserved),
3. fold ``http://`` to ``https://`` and strip a leading ``www.``,
4. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``)
   and SORT the survivors (param order is not semantic),
5. strip trailing slashes from the path.

Everything is built from string/array expressions (split, regexp,
higher-order filter, array_sort) — whole-stage codegen, zero Python,
so at 10^12 captures the normalization is a map-side projection with
no shuffle at all. ``canonical_url_sql`` is the DuckDB rendering of
the identical steps for the value oracle; parity on adversarial URLs
is pinned by tests/test_url.py.

Reference provenance: the reference (SpanMarkerNER) has no crawl
layer — this operator comes from the north-rule input shape
(url, warc_ts, html, text, lang) of BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# query parameters that never change page identity
_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Add ``out_col`` = canonical form of ``url_col`` (codegen only).

    Intermediate columns are projected once (Catalyst collapses the
    chain into a single Project), so each split/regexp runs once per
    row instead of being textually duplicated into one mega-expr.
    """
    drop = [c for c in ("_u1", "_parts", "_base", "_qs", "_pre") if c in df.columns]
    if drop:
        raise ValueError(f"temp column collision: {drop}")
    keep = " AND ".join(
        ["x != ''"] + [f"NOT startswith(x, '{p}')" for p in _TRACKING_PREFIXES]
    )
    return (
        df.withColumn("_u1", F.split(F.col(url_col), "#").getItem(0))
        .withColumn("_parts", F.split(F.col("_u1"), r"\?"))
        .withColumn("_base", F.col("_parts").getItem(0))
        .withColumn(
            "_qs",
            F.array_join(
                F.slice(
                    F.col("_parts"),
                    F.lit(2),
                    F.greatest(F.size("_parts") - 1, F.lit(0)),
                ),
                "?",
            ),
        )
        .withColumn("_pre", F.regexp_extract("_base", "^((?i:https?)://[^/]*)", 1))
        .withColumn(
            out_col,
            F.concat(
                # scheme+host: lowercase, http->https, strip www.
                F.regexp_replace(
                    F.regexp_replace(
                        F.lower(F.col("_pre")), "^http://", "https://"
                    ),
                    r"^https://www\.",
                    "https://",
                ),
                # path: case preserved, trailing slashes stripped
                F.regexp_replace(
                    F.expr("substring(_base, length(_pre) + 1)"), "/+$", ""
                ),
                # query: tracking params dropped, survivors sorted
                F.expr(
                    "CASE WHEN array_join(array_sort(filter(split(_qs, '&'),"
                    f" x -> {keep})), '&') != ''"
                    " THEN concat('?', array_join(array_sort(filter("
                    f"split(_qs, '&'), x -> {keep})), '&'))"
                    " ELSE '' END"
                ),
            ),
        )
        .drop("_u1", "_parts", "_base", "_qs", "_pre")
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB rendering of the same five steps, as ONE expression over
    ``expr`` (oracle side). Kept adjacent to the Spark builder so the
    two cannot drift silently; byte parity pinned by tests/test_url.py.
    """
    keep = " AND ".join(
        ["x <> ''"] + [f"NOT starts_with(x, '{p}')" for p in _TRACKING_PREFIXES]
    )
    u1 = f"string_split({expr}, '#')[1]"
    parts = f"string_split({u1}, '?')"
    base = f"({parts})[1]"
    qs = f"array_to_string(list_slice({parts}, 2, len({parts})), '?')"
    pre = f"regexp_extract({base}, '^((?i:https?)://[^/]*)', 1)"
    host = (
        "regexp_replace(regexp_replace(lower("
        + pre
        + "), '^http://', 'https://'), '^https://www\\.', 'https://')"
    )
    path = f"regexp_replace(substr({base}, length({pre}) + 1), '/+$', '')"
    q = (
        f"array_to_string(list_sort(list_filter(string_split({qs}, '&'),"
        f" x -> {keep})), '&')"
    )
    return (
        f"({host} || {path} || "
        f"CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END)"
    )
