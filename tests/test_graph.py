"""PageRank + co-occurrence graph construction."""

from __future__ import annotations


def _py_pagerank(edges, iters=3, damping_pct=85, scale=10**12):
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    n = len(deg)
    r = {v: scale // n for v in deg}
    base = (100 - damping_pct) * (scale // n) // 100
    for _ in range(iters):
        inr = defaultdict(int)
        for s, d in edges:
            inr[d] += r[s] // deg[s]
        r = {v: base + damping_pct * inr[v] // 100 for v in inr}
    return r


def test_cooccurrence_edges(spark):
    from spanmarkerner_spark.operators.graph import cooccurrence_edges

    rows = [(1, "a"), (1, "b"), (1, "b"), (2, "b"), (2, "c"), (3, "d")]
    df = spark.createDataFrame(rows, "k long, node string")
    got = {(r["src"], r["dst"]) for r in cooccurrence_edges(df, "k", "node").collect()}
    assert got == {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}


def test_pagerank_matches_python_twin(spark):
    from spanmarkerner_spark.operators.graph import pagerank

    # star: hub 0 connected to 1..4, plus a 5-6 pair
    pairs = [(0, i) for i in range(1, 5)] + [(5, 6)]
    edges = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    want = _py_pagerank(edges, iters=3)
    assert got == want
    # the hub out-ranks every leaf
    assert all(got[0] > got[i] for i in range(1, 5))


def test_pagerank_deterministic_across_parallelism(spark):
    from spanmarkerner_spark.operators.graph import pagerank

    pairs = [(i, (i * 3 + 1) % 11) for i in range(11)]
    edges = [e for a, b in pairs if a != b for e in [(a, b), (b, a)]]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, pagerank(df.repartition(2), iters=3).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(16), iters=3).collect()))
    assert a == b


def test_label_propagation_two_communities(spark):
    """Two 4-cliques joined by one bridge edge: after 3 rounds every
    clique member carries its clique's minimum node id; determinism
    across input parallelism."""
    from spanmarkerner_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a != b]
    bridge = [(4, 10), (10, 4)]
    edges = spark.createDataFrame(c1 + c2 + bridge, "src long, dst long")
    got = {r["node"]: r["label"]
           for r in label_propagation(edges, iters=3).collect()}
    assert all(got[n] == 1 for n in range(1, 5))
    assert all(got[n] == 10 for n in range(11, 14))
    got8 = {r["node"]: r["label"]
            for r in label_propagation(edges.repartition(8), iters=3).collect()}
    assert got8 == got


def test_k_core_peels_tail_cascade(spark):
    """Triangle + pendant chain, k=2: the chain peels in cascade
    (5 first, then 4), leaving exactly the triangle with in-core
    degree 2 each. Edges given one-direction-only — k_core must
    symmetrize internally."""
    from spanmarkerner_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r["node"]: r["degree"] for r in k_core(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_path_graph_empties(spark):
    """A pure path has no 2-core: peeling eats it from both ends —
    more rounds than nodes/2 never needed, early-stop must still
    terminate with an empty result."""
    from spanmarkerner_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    assert k_core(edges, k=2, max_rounds=16).count() == 0


def test_k_core_fixed_rounds_is_converged_at_fixture_scale(spark):
    """The driver oracle unrolls 16 rounds; pin that 16 rounds IS the
    fixed point on the sf0.001 mutual-kNN graph (so the fixed-grain
    result equals the true k-core there)."""
    from spanmarkerner_spark.operators.graph import k_core
    from spanmarkerner_spark.operators.similarity import knn_graph_mutual
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    edges = knn_graph_mutual(emb, k=5, bucket_dims=4).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint(eager=True)
    a = {(r["node"], r["degree"]) for r in k_core(edges, k=3, max_rounds=16).collect()}
    b = {(r["node"], r["degree"]) for r in k_core(edges, k=3, max_rounds=24).collect()}
    assert a == b and len(a) > 0
