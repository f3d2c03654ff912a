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
    all_rows = gen_pages(80, seed=11)
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
