"""north_rule mechanism test: the job runs via `spark-submit
--py-files <pkg.zip>` (fresh JVM, package imported from the zip),
writes lineage + metrics tables, produces oracle-correct triples, and
a second submit is a full resume no-op."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit():
    """spark-submit, PATH-independent (VERDICT r3 #4): PATH, then
    $SPARK_HOME/bin, then the script bundled inside the pyspark
    package — the last always exists in any env that can run these
    tests, so the north-rule mechanism is always exercised."""
    found = shutil.which("spark-submit")
    if found:
        return found
    home = os.environ.get("SPARK_HOME")
    if home and os.path.isfile(os.path.join(home, "bin", "spark-submit")):
        return os.path.join(home, "bin", "spark-submit")
    import pyspark

    bundled = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    assert os.path.isfile(bundled), "no spark-submit anywhere (PATH/SPARK_HOME/pyspark)"
    return bundled


def test_spark_submit_pyfiles_end_to_end(spark):
    from spanmarkerner_spark import schemas
    from spanmarkerner_spark.config import KG_LABELS, SpanMarkerConfig
    from spanmarkerner_spark.datagen import gen_pages
    from spanmarkerner_spark.oracle import run_oracle

    tmp = tempfile.mkdtemp(prefix="submit_test_")
    try:
        rows = gen_pages(30, seed=13)
        spark.createDataFrame(rows, schema=schemas.PAGES).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/pages")

        zip_path = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py"),
             f"{tmp}/dist"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()

        def submit(run_id: str) -> str:
            p = subprocess.run(
                [_spark_submit(), "--master", "local[4]",
                 "--py-files", zip_path,
                 os.path.join(REPO, "scripts", "submit_kg.py"),
                 "--pages", f"{tmp}/pages", "--out", f"{tmp}/kg",
                 "--run-id", run_id],
                capture_output=True, text=True, timeout=600,
            )
            assert p.returncode == 0, p.stderr[-2000:]
            return p.stdout

        out1 = submit("r1")
        assert "RUN r1" in out1 and "METRICS" in out1

        # triples match the single-process oracle exactly
        from spanmarkerner_spark.plans import lineage as L

        got = {
            tuple(r)
            for r in L.read_stage(spark, f"{tmp}/kg", "triples")
            .select("subj", "pred", "obj", "url", "sentence_id")
            .collect()
        }
        expected = run_oracle(rows, SpanMarkerConfig(labels=KG_LABELS))["triples"]
        assert got == expected

        # metrics table has the run's rows
        m = {
            r["metric"]: r["value"]
            for r in L.read_metrics(spark, f"{tmp}/kg")
            .filter("run_id = 'r1'")
            .collect()
        }
        assert m["pages_in"] == float(len(rows))
        assert m["triples"] == float(len(expected))

        # second submit: full resume no-op (zero-output buckets were
        # marked done via processed_input)
        out2 = submit("r2")
        assert "RESUME: all buckets already have 'triples' lineage" in out2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
