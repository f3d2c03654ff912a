"""Streaming × lineage integration: the stream's resume state lives in
the shared file-grained lineage table, so a restart recovers even when
the STREAMING checkpoint is lost — no duplicate triples, no lost files.
"""

from __future__ import annotations

import shutil
import tempfile

from spanmarkerner_spark import schemas as S
from spanmarkerner_spark.config import KG_LABELS, SpanMarkerConfig
from spanmarkerner_spark.datagen import gen_pages
from spanmarkerner_spark.oracle import run_oracle
from spanmarkerner_spark.pipeline import run_pipeline
from spanmarkerner_spark.plans.lineage import read_file_lineage
from spanmarkerner_spark.streaming.ingest import stream_pages_to_triples_lineage


def _write_file(spark, rows, pages_dir):
    # one parquet file per call (append => new file in the stream dir)
    spark.createDataFrame(rows, schema=S.PAGES).coalesce(1).write.mode(
        "append"
    ).parquet(pages_dir)


def test_stream_resumes_from_lineage_after_checkpoint_loss(spark):
    # probes=False: this test slices rows into exact 20-page files
    all_rows = gen_pages(80, seed=11, probes=False)
    tmp = tempfile.mkdtemp(prefix="stream_lineage_")
    pages_dir, out_dir = f"{tmp}/pages", f"{tmp}/kg"
    try:
        for lo in (0, 20, 40):  # three initial files
            _write_file(spark, all_rows[lo : lo + 20], pages_dir)

        q = stream_pages_to_triples_lineage(
            spark, pages_dir, out_dir, f"{tmp}/ckpt1"
        )
        q.awaitTermination(300)
        got1 = [
            tuple(r)
            for r in spark.read.parquet(f"{out_dir}/triples")
            .select("subj", "pred", "obj", "url", "sentence_id")
            .collect()
        ]
        cfg = SpanMarkerConfig(labels=KG_LABELS)
        assert set(got1) == run_oracle(all_rows[:60], cfg)["triples"]
        lineage1 = read_file_lineage(spark, out_dir)
        assert lineage1.count() == 3  # one row per file, incl. any 0-output

        # kill scenario: the streaming checkpoint is GONE, one new file
        # arrives; the restart re-lists every file but file lineage
        # filters the three finished ones
        shutil.rmtree(f"{tmp}/ckpt1")
        _write_file(spark, all_rows[60:80], pages_dir)
        q2 = stream_pages_to_triples_lineage(
            spark, pages_dir, out_dir, f"{tmp}/ckpt2"
        )
        q2.awaitTermination(300)
        got2 = [
            tuple(r)
            for r in spark.read.parquet(f"{out_dir}/triples")
            .select("subj", "pred", "obj", "url", "sentence_id")
            .collect()
        ]
        assert set(got2) == run_oracle(all_rows, cfg)["triples"]
        # no duplicates: streaming total == one batch run over all pages
        batch = run_pipeline(
            spark.createDataFrame(all_rows, schema=S.PAGES)
        )["triples"]
        assert len(got2) == batch.count()
        assert read_file_lineage(spark, out_dir).count() == 4

        # third run, nothing new: a no-op (no lineage rows, no triples)
        q3 = stream_pages_to_triples_lineage(
            spark, pages_dir, out_dir, f"{tmp}/ckpt3"
        )
        q3.awaitTermination(300)
        assert spark.read.parquet(f"{out_dir}/triples").count() == len(got2)
        assert read_file_lineage(spark, out_dir).count() == 4
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_zero_output_first_batch_does_not_wedge(spark):
    """A stage whose FIRST write produces zero rows must still append
    lineage (rows_out=0) instead of crashing on the unreadable empty
    table — otherwise the stream reprocesses/crashes on the same
    files forever."""
    import tempfile, shutil
    from pyspark.sql import functions as F
    from spanmarkerner_spark.plans import lineage as L

    tmp = tempfile.mkdtemp(prefix="lin_empty_")
    try:
        empty = spark.createDataFrame(
            [], "url string, x long, file_key string"
        )
        L.write_stage_by_file(
            empty, tmp, "triples", "run0", [("abcd1234abcd1234", "/f1")]
        )
        lin = L.read_file_lineage(spark, tmp).collect()
        assert [(r["file_key"], r["rows_out"]) for r in lin] == [
            ("abcd1234abcd1234", 0)
        ]
        # retry of the same files must not double-append lineage
        L.write_stage_by_file(
            empty, tmp, "triples", "run0-retry", [("abcd1234abcd1234", "/f1")]
        )
        assert L.read_file_lineage(spark, tmp).count() == 1
        # bucket-grain twin: empty first write + processed_input
        empty_b = spark.createDataFrame([], "url string, x long")
        inp = spark.createDataFrame([("u1", 1)], "url string, x long")
        L.write_stage(empty_b, tmp, "stage_b", "run0", processed_input=inp)
        rows = (
            L.read_lineage(spark, tmp).filter("stage = 'stage_b'").collect()
        )
        assert len(rows) == 1 and rows[0]["rows_out"] == 0
        L.write_stage(empty_b, tmp, "stage_b", "retry", processed_input=inp)
        assert (
            L.read_lineage(spark, tmp).filter("stage = 'stage_b'").count() == 1
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
