#!/usr/bin/env python3
"""Benchmark: headline queries + the end-to-end KG pipeline.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "extra": {...}}

The headline metric is end-to-end KG wall seconds; extra carries
triples/sec and sentences/sec (the north-rule throughput numbers).
Scaling evidence across parallelism levels is produced by
bench_scaling.py (separate JVMs per level) and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "j2_broadcast_lookup",
    "w3_topk_per_group",
    "events_windowed",
    "u3_spread",
    "text_quality",
    "dedup_exact",
    "dedup_minhash",
    "ann_brute_topk",
    "cc_components",
    "decontam_flagged",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from spanmarkerner_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=cpus)

    import __spark_entry__ as E

    qs = E.queries()
    times: dict[str, float] = {}
    # warm the python workers once (JVM + worker spawn out of the timings)
    qs["u3_spread"](spark, sf_dir).count()

    def timed(fn, trials: int = 2):
        # the host is shared: co-tenant load waves inflate single-shot
        # timings up to 10x (measured cc_components 4.6s vs 40.1s same
        # code same day) — report best-of-N (3 for the heavy keys:
        # their first trial also pays one-time codegen/JIT for the
        # widest generated code in the suite, so best-of-2 leaves a
        # single trial exposed to a load wave)
        best = None
        for _ in range(trials):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    # ---- kg_e2e FIRST: the headline metric must not inherit another
    # query's JVM state. Measured on this box: running the two minhash
    # LSH jobs before kg inflates kg's first trial 3.7s -> 42s (GC /
    # allocator debris, load avg 0.67 — not co-tenants). Python workers
    # are warmed explicitly with a tiny pipeline so trial 1 isn't
    # paying worker spawn either.
    from spanmarkerner_spark import schemas
    from spanmarkerner_spark.datagen import gen_pages
    from spanmarkerner_spark.pipeline import run_pipeline

    # write the union to parquet first: a LocalRelation of synthetic
    # pages embedded in the plan re-serializes into every stage
    import tempfile

    docs_pages = E._docs_as_pages(spark, sf_dir)
    synth = spark.createDataFrame(gen_pages(2000, seed=42), schema=schemas.PAGES)
    pages_dir = tempfile.mkdtemp(prefix="bench_pages_")
    docs_pages.unionByName(synth).write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    n_pages = pages.count()
    warm = spark.createDataFrame(gen_pages(50, seed=1), schema=schemas.PAGES)
    run_pipeline(warm, use_extracted=False)["triples"].count()

    # persist_stages=False for the timed run: linked has exactly one
    # consumer in the triples DAG, so caching it only adds
    # materialization cost (~25% of e2e measured) to the timed action
    kg_sec = None
    for _ in range(3):
        t0 = time.time()
        res = run_pipeline(pages, use_extracted=False, persist_stages=False)
        n_triples = res["triples"].count()
        dt = round(time.time() - t0, 3)
        kg_sec = dt if kg_sec is None or dt < kg_sec else kg_sec
    # stat counts AFTER the timed window (sentences recompute is
    # cheap codegen; linked re-runs NER but is untimed)
    n_sentences = res["sentences"].count()
    n_mentions = res["linked"].count()
    times["kg_e2e"] = kg_sec

    # ---- fresh SparkContext for the query loop (NOTE: stop() +
    # getOrCreate() recreates the CONTEXT — executors, block manager,
    # python workers, per-session codegen cache — inside the SAME
    # py4j JVM; JVM-wide JIT/heap state survives). The contamination
    # is symmetric: minhash-before-kg inflates kg 3.7s -> 42s (comment
    # above), and kg's 3 mapInPandas runs inflate BOTH dedup_minhash
    # trials 7.2s -> 13-16s (r3 driver bench 13.2s vs r2 6.2s on
    # unchanged code — chased in round 4: a clean session's trial 2 is
    # 7.2s, so best-of-2 never saw a warm trial after kg). The context
    # restart (~10s, untimed) empirically restored clean-session
    # timings, so the polluting state is context-scoped, not JVM-wide.
    spark.stop()
    spark = get_spark(app_name="bench_queries", cores=cpus)
    qs["u3_spread"](spark, sf_dir).count()  # re-warm workers + codegen

    for name in HEADLINE:
        if name == "dedup_minhash":
            # report BOTH minhash numbers so the bench line is
            # self-describing about which plan it timed:
            #   dedup_minhash     = PRODUCTION path (seeded xxhash64
            #                       signatures, ~5-10x cheaper)
            #   dedup_minhash_md5 = the md5 'portable' path the
            #                       driver's DuckDB oracle pins (16 md5
            #                       evaluations per shingle)
            from spanmarkerner_spark.operators.dedup import minhash_lsh_pairs

            def _minhash():
                return minhash_lsh_pairs(
                    E._t(spark, sf_dir, "documents"),
                    num_hashes=16,
                    bands=4,
                    jaccard_threshold=0.5,
                    max_bucket=50,
                    hash_fn="xxhash",
                ).count()

            # one untimed warmup: this query generates the widest
            # codegen in the suite and its FIRST execution pays ~10s
            # of one-time JIT (measured 18.9s cold / 7.2s second run /
            # ~5s steady-state in a clean session) — the timed trials
            # measure steady-state throughput, the 100-TB-relevant
            # number (methodology in BENCH.md round-4 notes)
            _minhash()
            times[name] = timed(_minhash, trials=3)
            times["dedup_minhash_md5"] = timed(
                lambda: qs[name](spark, sf_dir).count(), trials=3
            )
        elif name == "decontam_flagged":
            # same split as minhash: decontam_flagged = PRODUCTION
            # path (xxhash64 gram hashes — thin broadcast + thin
            # stream); decontam_flagged_exact = the string-gram path
            # the DuckDB oracle pins
            from spanmarkerner_spark.operators.decontam import contaminated_docs

            def _decontam(exact: bool):
                docs = E._t(spark, sf_dir, "documents")
                return contaminated_docs(
                    docs.filter("doc_id % 13 <> 0"),
                    docs.filter("doc_id % 13 = 0"),
                    n=3,
                    exact=exact,
                ).count()

            times[name] = timed(lambda: _decontam(False), trials=3)
            times["decontam_flagged_exact"] = timed(
                lambda: _decontam(True), trials=3
            )
        elif name == "cc_components":
            qs[name](spark, sf_dir).count()  # untimed codegen warmup
            times[name] = timed(
                lambda: qs[name](spark, sf_dir).count(), trials=3
            )
        else:
            times[name] = timed(lambda: qs[name](spark, sf_dir).count())

    # total counts each LOGICAL query once: the *_md5 / *_exact keys
    # are the oracle-pinned second timing of the same query and would
    # double-count it (and break comparability with round 1-2 totals)
    sent_per_sec = round(n_sentences / kg_sec, 2) if kg_sec else None
    total = round(
        sum(v for k, v in times.items()
            if not k.endswith("_md5") and not k.endswith("_exact")),
        3,
    )
    out = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        # HEADLINE THROUGHPUT UNIT (r4 verdict): sentences/sec. The
        # datagen change in round 4 (probe/ambiguous pages, rich
        # relation mix) changed triples-per-sentence, so triples/sec
        # is NOT comparable across rounds; sentences/sec is.
        "sentences_per_sec": sent_per_sec,
        "queries": times,
        "sf": sf,
        "extra": {
            "cpus": int(cpus) if str(cpus).isdigit() else cpus,
            "kg_pages": n_pages,
            "kg_sentences": n_sentences,
            "kg_mentions": n_mentions,
            "kg_triples": n_triples,
            "kg_sec": kg_sec,
            "triples_per_sec": round(n_triples / kg_sec, 2) if kg_sec else None,
            "sentences_per_sec": sent_per_sec,
            "pages_per_sec": round(n_pages / kg_sec, 2) if kg_sec else None,
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
