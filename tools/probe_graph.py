"""Isolated wall-time probe for the iterative graph queries (guide
§1.4 noop-sink isolation): times ONLY the Spark computation, warm
best-of-N, one query per line. Usage:

    python tools/probe_graph.py [sf_dir] [query ...]

Not a bench — a measurement harness for the r06 optimization log.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "web_host_hits",
    "graph_pagerank",
    "graph_label_prop",
    "graph_triangles",
    "graph_kcore",
]


def main() -> None:
    import __spark_entry__ as E
    from spanmarkerner_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    os.environ["SMN_KG_FIXTURE_SF"] = os.path.basename(sf_dir.rstrip("/"))
    spark = get_spark(app_name="probe_graph")
    qs = E.queries()
    # warm workers/codegen
    qs["u3_spread"](spark, sf_dir).count()
    for name in names:
        spark.sparkContext.setJobDescription(name)
        trials = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            trials.append(round(time.time() - t0, 2))
        print(f"{name:24s} best={min(trials):6.2f}  trials={trials}",
              flush=True)


if __name__ == "__main__":
    main()
