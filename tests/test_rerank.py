"""Cross-encoder rerank: parity with the single-process twin,
batch/partition invariance, and argmax semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanmarkerner_spark.config import KG_LABELS, SpanMarkerConfig

CFG = SpanMarkerConfig(labels=KG_LABELS)

MENTIONS_SCHEMA = (
    "url string, sentence_id long, word_start_index long, "
    "span string, sentence string, score double"
)
ALIAS_SCHEMA = "alias string, entity_id long, canonical_name string, prior double"


@pytest.fixture(scope="module")
def mentions(spark):
    rows = [
        ("u1", 0, 1, "paris", "paris is lovely", 0.9),
        ("u1", 0, 5, "tokyo", "tokyo rains", 0.8),
        ("u2", 1, 0, "unknownville", "unknownville exists", 0.7),
    ]
    return spark.createDataFrame(rows, MENTIONS_SCHEMA)


@pytest.fixture(scope="module")
def alias_dict(spark):
    rows = [
        ("paris", 1, "Paris, France", 0.8),
        ("paris", 2, "Paris, Texas", 0.2),
        ("tokyo", 3, "Tokyo", 1.0),
    ]
    return spark.createDataFrame(rows, ALIAS_SCHEMA)


def test_cross_scores_match_python_twin(spark, mentions, alias_dict):
    from spanmarkerner_spark.operators.rerank import (
        cross_score_py,
        link_mentions_cross,
    )

    out = {
        r["span"]: r
        for r in link_mentions_cross(mentions, alias_dict, CFG).collect()
    }
    assert out["unknownville"]["entity_id"] is None
    # recompute the winning pair's score single-process
    for span, name in [
        ("paris", out["paris"]["canonical_name"]),
        ("tokyo", "Tokyo"),
    ]:
        sent = {r["span"]: r["sentence"] for r in mentions.collect()}[span]
        (want,) = cross_score_py([(f"{span} {sent}", name)], CFG)
        assert out[span]["cross_score"] == pytest.approx(want, abs=0), (
            "float32 scores must be bit-identical to the twin"
        )


def test_partitioning_invariance(spark, mentions, alias_dict):
    from spanmarkerner_spark.operators.rerank import link_mentions_cross

    a = sorted(
        map(tuple, link_mentions_cross(mentions.repartition(1), alias_dict, CFG).collect())
    )
    b = sorted(
        map(tuple, link_mentions_cross(mentions.repartition(7), alias_dict, CFG).collect())
    )
    assert a == b


def test_rerank_argmax_uses_cross_times_prior(spark, mentions, alias_dict):
    from spanmarkerner_spark.operators.rerank import (
        cross_score_py,
        link_mentions_cross,
    )

    got = {
        r["span"]: r["entity_id"]
        for r in link_mentions_cross(mentions, alias_dict, CFG).collect()
    }
    sent = "paris is lovely"
    s1, s2 = cross_score_py(
        [(f"paris {sent}", "Paris, France"), (f"paris {sent}", "Paris, Texas")], CFG
    )
    want = 1 if s1 * 0.8 >= s2 * 0.2 else 2
    assert got["paris"] == want and got["tokyo"] == 3
