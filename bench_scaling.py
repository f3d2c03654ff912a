#!/usr/bin/env python3
"""Scaling-efficiency evidence (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors, sandboxed as local[8] vs
local[32] on the same input).

Runs the end-to-end KG pipeline in a fresh JVM per parallelism level
(separate subprocesses, so JIT/caches don't leak between levels),
prints one JSON line, and appends a row to BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

#: pages for the scaling measurement — enough work to saturate the
#: larger parallelism level (at 10k sentences, fixed overheads dominate
#: and the comparison measures JVM noise, not scaling)
N_SYNTH_PAGES = 80000

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from spanmarkerner_spark.session import get_spark
from spanmarkerner_spark import schemas
from spanmarkerner_spark.datagen import gen_pages
from spanmarkerner_spark.pipeline import run_pipeline
import __spark_entry__ as E

cores = int(sys.argv[1])
sf_dir = sys.argv[2]
n_synth = int(sys.argv[3])
pages_pq = sys.argv[4]
spark = get_spark(app_name=f"scaling_{cores}", cores=cores)
if not os.path.exists(os.path.join(pages_pq, "_SUCCESS")):
    synth = spark.createDataFrame(gen_pages(n_synth, seed=42), schema=schemas.PAGES)
    docs_pages = E._docs_as_pages(spark, sf_dir)
    docs_pages.unionByName(synth).write.mode("overwrite").parquet(pages_pq)
pages = spark.read.parquet(pages_pq)
pages.count()  # warm: input listing + python workers
t0 = time.time()
res = run_pipeline(pages, use_extracted=False, persist_stages=False)
n_triples = res["triples"].count()
dt = time.time() - t0
n_sent = res["sentences"].count()
print("RESULT " + json.dumps({
    "cores": cores, "sec": round(dt, 3), "triples": n_triples,
    "sentences": n_sent,
    "triples_per_sec": round(n_triples / dt, 2),
    "sentences_per_sec": round(n_sent / dt, 2),
}))
spark.stop()
"""


def run_level(cores: int, sf_dir: str, pages_pq: str) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = WORKER % {"repo": repo}
    cmd = [sys.executable, "-c", code, str(cores), sf_dir,
           str(N_SYNTH_PAGES), pages_pq]
    # pin the whole JVM+python-worker tree to exactly `cores` physical
    # cores: an unpinned local[2] JVM still spreads GC/shuffle/worker
    # threads over every core of the box, which inflates the small
    # level and UNDERSTATES scaling. On a real cluster an N-core
    # executor is cgroup-bound to N cores — taskset reproduces that.
    if shutil.which("taskset") and os.environ.get("SCALING_PIN", "1") == "1":
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    p = subprocess.run(
        cmd,
        capture_output=True, text=True, timeout=3000,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}: {p.stderr[-2000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo = int(os.environ.get("SCALING_LO", "8"))
    hi = int(os.environ.get("SCALING_HI", "32"))
    trials = int(os.environ.get("SCALING_TRIALS", "3"))
    sf_tag = sf_dir.rstrip("/").replace("/", "_")
    pages_pq = f"/tmp/scaling_pages_{sf_tag}_{N_SYNTH_PAGES}"
    # the sandbox host is shared with other tenants (load avg >> our
    # usage with zero local processes): alternate levels and take the
    # best trial per level so external load waves don't bias one side
    best: dict[int, dict] = {}
    for _ in range(trials):
        for cores in (lo, hi):
            r = run_level(cores, sf_dir, pages_pq)
            if cores not in best or r["sec"] < best[cores]["sec"]:
                best[cores] = r
    r_lo, r_hi = best[lo], best[hi]
    speedup = r_hi["sentences_per_sec"] / r_lo["sentences_per_sec"]
    efficiency = round(speedup / (hi / lo), 4)
    out = {
        "metric": "scaling_efficiency",
        "value": efficiency,
        "unit": "ratio",
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "levels": {str(lo): r_lo, str(hi): r_hi},
        "speedup": round(speedup, 4),
    }
    print(json.dumps(out))
    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "BENCH.md"), "a") as f:
        f.write(
            f"\n| {sf_dir} | local[{lo}] {r_lo['sec']}s "
            f"({r_lo['sentences_per_sec']} sent/s, {r_lo['triples_per_sec']} tri/s) "
            f"| local[{hi}] {r_hi['sec']}s "
            f"({r_hi['sentences_per_sec']} sent/s, {r_hi['triples_per_sec']} tri/s) "
            f"| speedup {round(speedup, 3)}x | efficiency {efficiency} |\n"
        )


if __name__ == "__main__":
    main()
