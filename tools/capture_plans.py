"""Capture .explain("formatted") for declared queries into files.

Usage: python tools/capture_plans.py OUTDIR SUFFIX [sf_dir] [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each named query (default: a
curated list of the queries touched this round). The kg_e2e entry is
the bench pipeline's triples frame (not a declared oracle query, but
the headline bench metric).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "u3_spread",
    "ann_brute_topk",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_lines",
    "dedup_substring",
    "dedup_semantic",
    "decontam_flagged",
    "cc_components",
    "graph_bfs_dist",
    "graph_random_walks",
    "text_quality_classifier",
    "curation_e2e",
    "graph_knn_mutual",
    "kg_e2e",
]


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = sys.argv[4:] or DEFAULT
    os.makedirs(outdir, exist_ok=True)
    os.environ["SMN_KG_FIXTURE_SF"] = os.path.basename(sf_dir.rstrip("/"))

    from spanmarkerner_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    import __spark_entry__ as E

    qs = E.queries()
    for name in names:
        try:
            if name == "kg_e2e":
                from spanmarkerner_spark import schemas
                from spanmarkerner_spark.datagen import gen_pages
                from spanmarkerner_spark.pipeline import run_pipeline

                pages = spark.createDataFrame(
                    gen_pages(200, seed=42), schema=schemas.PAGES
                )
                df = run_pipeline(
                    pages, use_extracted=False, persist_stages=False
                )["triples"]
            else:
                df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path} ({len(buf.getvalue())} bytes)")
        except Exception as exc:  # noqa: BLE001
            print(f"FAILED {name}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
