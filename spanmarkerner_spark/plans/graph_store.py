"""Partitioned graph-table materialization (north_star: '(subj, pred,
obj) triple materialization ... into partitioned Iceberg graph
tables'; parquet bucketed tables stand in for Iceberg's bucket()
transform — no Iceberg jars in this sandbox, same layout contract).

The warehouse layout for traversal workloads stores the edge set
TWICE, bucketed+sorted by each join endpoint:

  <table>_by_subj  bucketBy(n, subj)   — outgoing-edge lookups
  <table>_by_obj   bucketBy(n, obj)    — incoming-edge lookups

A k-hop path query then chains co-bucketed sort-merge joins with
ZERO Exchange: hop i's right side reads `_by_subj` pre-hashed on
subj, the left side's obj column is bucketed identically in
`_by_obj`. At 10^12 edges the double-write costs 2x storage once;
every traversal after that skips the dominant shuffle entirely. The
duplicate-storage trade is the standard one (e.g. GraphFrames'
adjacency caching, warehouse edge tables indexed both ways).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bucketing import write_bucketed

EDGE_COLS = ["subj", "pred", "obj"]


def write_graph_store(
    triples: DataFrame, table_prefix: str, path_prefix: str, n_buckets: int = 8
) -> None:
    """Materialize the DISTINCT edge set under both bucket layouts.
    `triples` may carry provenance columns (url, sentence_id); the
    graph store keeps the edge grain."""
    # persist across the TWO writes: without it the full upstream plan
    # (potentially the whole KG pipeline) plus the distinct shuffle
    # re-executes for the second layout (round-4 review)
    edges = triples.select(*EDGE_COLS).distinct().persist()
    try:
        write_bucketed(
            edges, f"{table_prefix}_by_subj", "subj", n_buckets,
            f"{path_prefix}_by_subj",
        )
        write_bucketed(
            edges, f"{table_prefix}_by_obj", "obj", n_buckets,
            f"{path_prefix}_by_obj",
        )
    finally:
        edges.unpersist()


def two_hop(spark: SparkSession, table_prefix: str) -> DataFrame:
    """(src, pred1, mid, pred2, dst) paths via one co-bucketed
    sort-merge join: left scans `_by_obj` (pre-hashed on obj), right
    scans `_by_subj` (pre-hashed on subj) — the a.obj == b.subj join
    needs no Exchange on either side (pinned by
    tests/test_operators.py::test_graph_store_two_hop_no_exchange)."""
    a = spark.table(f"{table_prefix}_by_obj").alias("a")
    b = spark.table(f"{table_prefix}_by_subj").hint("merge").alias("b")
    return a.join(b, F.col("a.obj") == F.col("b.subj")).select(
        F.col("a.subj").alias("src"),
        F.col("a.pred").alias("pred1"),
        F.col("a.obj").alias("mid"),
        F.col("b.pred").alias("pred2"),
        F.col("b.obj").alias("dst"),
    )


def k_hop(spark: SparkSession, table_prefix: str, k: int) -> DataFrame:
    """Length-k paths (n0, p1, n1, ..., pk, nk) over the doubly-
    bucketed store. Join discipline at every hop: the EDGE TABLE side
    reads a bucketed layout pre-hashed on its join endpoint and is
    never shuffled; only the FRONTIER (the accumulated path frame)
    re-partitions between hops. Hop 2 is fully exchange-free (the
    `_by_obj` scan is already hashed on n1 — the two_hop case); each
    further hop shuffles just the frontier on its tail node, so a
    k-hop over 10^12 edges moves O(paths) bytes, never O(edges) —
    pinned by test_graph_store_k_hop_edge_side_never_shuffled.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    cur = spark.table(f"{table_prefix}_by_obj").select(
        F.col("subj").alias("n0"), F.col("pred").alias("p1"),
        F.col("obj").alias("n1"),
    )
    for i in range(2, k + 1):
        nxt = (
            spark.table(f"{table_prefix}_by_subj")
            .hint("merge")
            .select(
                F.col("subj").alias("_j"),
                F.col("pred").alias(f"p{i}"),
                F.col("obj").alias(f"n{i}"),
            )
        )
        cur = cur.join(nxt, F.col(f"n{i - 1}") == F.col("_j")).drop("_j")
    return cur
