"""Hyperlink graph construction from raw page HTML.

The web link graph is core KG-pipeline infrastructure: host-level
authority (for source-quality priors a la Common Crawl's cc-webgraph),
dangling-link detection, and the edge input for PageRank-family
signals (operators/graph.py). The reference (SpanMarkerNER,
span_marker/modeling.py) consumes plain sentences and has no notion
of page structure; this module is the KG-construction extension that
turns the `pages.html` column the pipeline already ingests
(schemas.PAGES) into an analyzable graph.

Spark-first shape: anchor extraction is PURE per-row codegen
expressions — `regexp_extract_all` over the decoded html, an explode,
and `CASE`-based URL normalization; no UDF, no shuffle. The host
graph is ONE groupBy whose key space is host-vocabulary-thin (heavy
map-side partial aggregation), and degree tables re-aggregate the
host graph itself — the link table is never shuffled twice. At
100 TB the only skew risk is mega-host keys in the host groupBy;
the (src_host, dst_host) pair key is already finer than per-host,
and AQE skew-split handles the residue (pinned for joins in
tests/test_skew_canonical.py).

Normalization contract (kept deliberately SQL-mirrorable so the
DuckDB oracle can replay it value-for-value):
  - fragment (`#...`) stripped;
  - absolute `http(s)://` hrefs kept as-is;
  - root-relative `/path` hrefs resolved against the source page's
    scheme+host;
  - everything else (mailto:, javascript:, data:, protocol-relative,
    path-relative, empty) dropped — documented narrowing, the same
    subset cc-webgraph keeps for host graphs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: one <a> element; href first, then the visible anchor text.
_ANCHOR_PAT = '<a href="([^"]*)"[^>]*>([^<]*)</a>'


def host_of(col: Column | str) -> Column:
    """scheme-stripped authority of an absolute http(s) URL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, "^https?://([^/]+)", 1)


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url, anchor) — one row per kept anchor element.

    Accepts `html` as binary or string (binary casts as UTF-8). Rows
    whose href normalizes to NULL (non-http scheme, path-relative)
    are dropped per the module contract.
    """
    elems = F.expr(
        f"regexp_extract_all(cast({html_col} as string), '{_ANCHOR_PAT}', 0)"
    )
    href_raw = F.regexp_extract(F.col("_elem"), _ANCHOR_PAT, 1)
    anchor = F.regexp_extract(F.col("_elem"), _ANCHOR_PAT, 2)
    # fragment strip: split never returns an empty array for
    # non-null input, so getItem(0) is total
    href = F.split(href_raw, "#").getItem(0)
    scheme_host = F.regexp_extract(
        F.col("src_url"), "^(https?://[^/]+)", 1
    )
    dst = (
        F.when(href.rlike("^https?://"), href)
        .when(href.rlike("^/"), F.concat(scheme_host, href))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(elems).alias("_elem"),
        )
        .select(
            "src_url",
            dst.alias("dst_url"),
            anchor.alias("anchor"),
        )
        .filter(F.col("dst_url").isNotNull() & (F.col("dst_url") != ""))
    )


def host_graph(links: DataFrame) -> DataFrame:
    """Host-level edge list: (src_host, dst_host, n_links,
    n_src_pages). n_src_pages = distinct source pages carrying the
    edge (the support unit host-authority signals actually want —
    a single hub page with 10k footer links counts once)."""
    return (
        links.select(
            host_of("src_url").alias("src_host"),
            host_of("dst_url").alias("dst_host"),
            "src_url",
        )
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.countDistinct("src_url").cast("long").alias("n_src_pages"),
        )
    )


def host_degrees(edges: DataFrame) -> DataFrame:
    """Per-host degree table from a host_graph edge list:
    (host, out_links, out_hosts, in_links, in_hosts). Re-aggregates
    the host-vocabulary-sized edge table, NOT the raw links; hosts
    appearing only as targets (dangling at host grain) get
    out_* = 0 and vice versa."""
    out = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.sum("n_links").cast("long").alias("out_links"),
        F.count(F.lit(1)).cast("long").alias("out_hosts"),
    )
    in_ = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.sum("n_links").cast("long").alias("in_links"),
        F.count(F.lit(1)).cast("long").alias("in_hosts"),
    )
    joined = out.join(in_, "host", "full_outer")
    return joined.select(
        "host",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("out_links", "out_hosts", "in_links", "in_hosts")
        ],
    )


def anchor_prior(links: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Anchor-text -> target prior: P(dst_host | anchor), the
    web-native entity-linking dictionary (Spitkovsky & Chang 2012
    build exactly this table from Wikipedia anchors; at web scale it
    is the strongest single linking feature). Complements the
    corpus-derived alias prior (operators/linking.py) with evidence
    from how PAGES link, not how text mentions.

    Input: extract_links output. Output per (anchor, dst_host):
      (anchor, dst_host, n, n_anchor, prior_ppm)
    prior_ppm = exact BIGINT share of the anchor's links targeting
    the host.

    Scale design (100 TB): one groupBy on (anchor, dst_host) —
    map-side-combinable, key finer than the anchor so "click here"
    cannot pin a reducer; anchor totals re-aggregate the
    (anchor, host) table, not the raw links, and join back broadcast
    (anchor-vocabulary-sized)."""
    ah = (
        links.select(
            F.col("anchor"),
            host_of("dst_url").alias("dst_host"),
        )
        .groupBy("anchor", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = ah.groupBy("anchor").agg(
        F.sum("n").cast("long").alias("n_anchor")
    )
    return ah.join(F.broadcast(totals), "anchor").select(
        "anchor",
        "dst_host",
        "n",
        "n_anchor",
        F.expr(f"n * {scale} div n_anchor").cast("long").alias("prior_ppm"),
    )
