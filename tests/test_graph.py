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


def test_bfs_distances_hand_computed_path(spark):
    from spanmarkerner_spark.operators.graph import bfs_distances

    # path 0->1->2->3->4 plus an unreachable 9->8 component
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (9, 8)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_dist=3).collect()
    }
    # 4 is beyond the 3-hop budget; 8/9 unreachable from the seed
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_distances_min_merge_on_diamond(spark):
    from spanmarkerner_spark.operators.graph import bfs_distances

    # diamond: two routes to 3 (0->1->3 and 0->2->3), plus 3->1 back
    # edge that must NOT overwrite 1's earlier distance
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_dist=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def _py_ppr(edges, seed_nodes, iters=3, damping_pct=85, scale=10**12):
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    ns = len(seed_nodes)
    base = (100 - damping_pct) * (scale // ns) // 100
    r = {v: scale // ns for v in seed_nodes}
    for _ in range(iters):
        inr = defaultdict(int)
        for s, d in edges:
            if s in r:
                inr[d] += r[s] // deg[s]
        nxt = defaultdict(int)
        for v, x in inr.items():
            nxt[v] += damping_pct * x // 100
        for v in seed_nodes:
            nxt[v] += base
        r = {v: x for v, x in nxt.items() if x > 0}
    return r


def test_personalized_pagerank_matches_python_twin(spark):
    from spanmarkerner_spark.operators.graph import personalized_pagerank

    # two components: seeds live in the first; the second must get 0 mass
    pairs = [(0, 1), (1, 2), (2, 0), (1, 3), (5, 6), (6, 5)]
    edges = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, seeds, iters=3).collect()
    }
    want = _py_ppr(edges, {0}, iters=3)
    assert got == want
    assert 5 not in got and 6 not in got  # mass stays seed-local


def test_dense_ids_match_global_rank_and_parallelism_invariant(spark):
    from spanmarkerner_spark.plans.dict_store import dense_ids

    vals = [f"t{i:03d}" for i in range(199)]
    import random

    rnd = random.Random(7)
    shuffled = vals[:]
    rnd.shuffle(shuffled)
    df = spark.createDataFrame([(v,) for v in shuffled], "term string")
    for buckets in (1, 4, 64):
        got = {
            r["term"]: r["tid"]
            for r in dense_ids(df, "term", buckets=buckets).collect()
        }
        want = {v: i + 1 for i, v in enumerate(sorted(vals))}
        assert got == want, f"buckets={buckets}"


def test_dict_encode_shared_node_dictionary(spark):
    from spanmarkerner_spark.plans.dict_store import dict_encode_triples

    tri = spark.createDataFrame(
        [
            ("a", "p", "b"),
            ("b", "q", "c"),  # b is subj here, obj above: ONE id
        ],
        "subj string, pred string, obj string",
    )
    store = dict_encode_triples(tri)
    terms = {r["term"]: r["tid"] for r in store["terms"].collect()}
    assert terms == {"a": 1, "b": 2, "c": 3}
    enc = {
        (r["s_id"], r["p_id"], r["o_id"])
        for r in store["encoded"].collect()
    }
    assert enc == {(1, 1, 2), (2, 2, 3)}


def test_star_join_resolved_counts(spark):
    from spanmarkerner_spark.plans.dict_store import (
        dict_encode_triples,
        star_join_resolved,
    )

    tri = spark.createDataFrame(
        [
            ("s1", "supplies", "p1"),
            ("s1", "supplies", "p2"),
            ("s1", "in_nation", "n1"),
            ("s2", "supplies", "p1"),
            ("s2", "in_nation", "n2"),  # wrong nation: excluded
            ("s3", "in_nation", "n1"),  # no supplies edges: excluded
        ],
        "subj string, pred string, obj string",
    )
    store = dict_encode_triples(tri)
    got = {
        (r["s_id"], r["n_a"])
        for r in star_join_resolved(
            store, "supplies", "in_nation", "n1"
        ).collect()
    }
    terms = {r["term"]: r["tid"] for r in store["terms"].collect()}
    assert got == {(terms["s1"], 2)}


def test_extend_dictionary_stable_ids_and_fresh_ranks(spark):
    from spanmarkerner_spark.plans.dict_store import (
        dense_ids,
        dict_encode_triples,
        extend_dictionary,
    )

    epoch1 = spark.createDataFrame(
        [("a", "p", "c"), ("c", "p", "e")], "subj string, pred string, obj string"
    )
    store = dict_encode_triples(epoch1)
    epoch2 = spark.createDataFrame(
        [("b", "p", "c"), ("e", "p", "d")], "subj string, pred string, obj string"
    )
    ext = {
        r["term"]: r["tid"]
        for r in extend_dictionary(store["terms"], epoch2).collect()
    }
    # old ids unchanged; new terms ranked among themselves from max+1
    assert ext == {"a": 1, "c": 2, "e": 3, "b": 4, "d": 5}
    # extending with an already-covered epoch is a no-op
    again = {
        r["term"]: r["tid"]
        for r in extend_dictionary(store["terms"], epoch1).collect()
    }
    assert again == {"a": 1, "c": 2, "e": 3}


def test_random_walks_match_python_twin_and_end_early(spark):
    import hashlib

    from spanmarkerner_spark.operators.graph import random_walks

    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]  # 4 is a sink
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(df, seeds, walk_len=6).collect()
    )

    def h(walk_id, t):
        s = f"walk|{walk_id}:{t}".encode()
        return int(hashlib.md5(s).hexdigest()[:15], 16)

    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, []).append(d)
    for s in nbrs:
        nbrs[s].sort()
    want, cur = [(0, 0, 0)], 0
    for t in range(1, 7):
        if cur not in nbrs:
            break  # walk ends at the sink
        cur = nbrs[cur][h(0, t) % len(nbrs[cur])]
        want.append((0, t, cur))
    assert got == sorted(want)
    # the walk must actually end early: node 4 has no out-edges and
    # the graph is a DAG of depth 3, so a 6-step walk cannot be full
    assert len(got) < 7
    # deterministic across parallelism
    got2 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(df.repartition(8), seeds, walk_len=6).collect()
    )
    assert got2 == got


def test_ppr_support_within_bfs_radius_randomized(spark):
    """Cross-operator invariant: after k rounds, personalized-PageRank
    mass can only sit on nodes within k hops of the seed set — PPR's
    support must be a subset of the BFS-reachable ball. Randomized
    graph, fixed seed."""
    import random

    from spanmarkerner_spark.operators.graph import (
        bfs_distances,
        personalized_pagerank,
    )

    rnd = random.Random(20260818)
    n = 40
    edges = list({
        (rnd.randrange(n), rnd.randrange(n)) for _ in range(120)
    })
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (7,)], "node long")
    dist = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, seeds, max_dist=3).collect()
    }
    ranks = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, seeds, iters=3).collect()
    }
    assert set(ranks) <= set(dist), (
        "PPR mass outside the 3-hop BFS ball"
    )
    # and BFS itself agrees with a python twin
    import collections

    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    want, frontier = {0: 0, 7: 0}, [0, 7]
    for d in range(1, 4):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in want:
                    want[v] = d
                    nxt.append(v)
        frontier = nxt
    assert dist == want


def test_dense_ids_randomized_against_sorted_rank(spark):
    import random

    from spanmarkerner_spark.plans.dict_store import dense_ids

    rnd = random.Random(99)
    vals = list({f"w{rnd.randrange(10**6):06d}" for _ in range(700)})
    # include duplicates in the INPUT (dense_ids must distinct first)
    rows = [(v,) for v in vals] + [(v,) for v in rnd.sample(vals, 50)]
    rnd.shuffle(rows)
    df = spark.createDataFrame(rows, "term string").repartition(13)
    got = {
        r["term"]: r["tid"]
        for r in dense_ids(df, "term", buckets=7).collect()
    }
    want = {v: i + 1 for i, v in enumerate(sorted(vals))}
    assert got == want


def test_dense_ids_single_shared_range_exchange(spark):
    """dense_ids' counts branch and rank branch must read ONE shared
    range exchange (module docstring: duplicated exchanges would
    re-sample their own boundaries and corrupt the offsets). Pin:
    the executed plan contains a ReusedExchange and exactly one
    EXECUTED rangepartitioning exchange."""
    from spanmarkerner_spark.plans.dict_store import dense_ids

    df = spark.createDataFrame(
        [(f"t{i:04d}",) for i in range(300)], "term string"
    ).repartition(5)
    out = dense_ids(df, "term", buckets=8)
    out.collect()
    jplan = out._jdf.queryExecution().executedPlan()

    def walk(jp):
        cls = jp.getClass().getSimpleName()
        yield cls, jp
        if cls == "AdaptiveSparkPlanExec":
            yield from walk(jp.executedPlan())
        elif cls.endswith("QueryStageExec"):
            yield from walk(jp.plan())
        elif cls == "ReusedExchangeExec":
            return
        ch = jp.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    nodes = list(walk(jplan))
    names = [c for c, _ in nodes]
    range_exchanges = [
        jp for c, jp in nodes
        if c == "ShuffleExchangeExec"
        and "rangepartitioning" in jp.toString().splitlines()[0].lower()
    ]
    assert names.count("ReusedExchangeExec") >= 1, names
    assert len(range_exchanges) == 1, [
        jp.toString().splitlines()[0] for jp in range_exchanges
    ]
