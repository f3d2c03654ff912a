"""Facade parity with the reference's predict() input shapes
(tests/test_modeling.py:61-110,199-217 semantics)."""

from __future__ import annotations

import tempfile

import pytest

from spanmarkerner_spark.api import SpanMarkerSparkModel
from spanmarkerner_spark.config import KG_LABELS, SpanMarkerConfig
from spanmarkerner_spark.datagen import gazetteer


@pytest.fixture(scope="module")
def model(spark):
    cfg = SpanMarkerConfig(labels=KG_LABELS)
    return SpanMarkerSparkModel(cfg, gazetteer(cfg), spark)


def test_predict_string(model):
    ents = model.predict("yesterday john smith moved to paris")
    got = {(e["span"], e["label"]) for e in ents}
    assert ("john smith", "person") in got
    assert ("paris", "location") in got
    # char offsets point into the input string
    s = "yesterday john smith moved to paris"
    for e in ents:
        assert s[e["char_start_index"] : e["char_end_index"]] == e["span"]


def test_predict_pretokenized(model):
    ents = model.predict(["john", "smith", "visited", "berlin"])
    got = {(e["span"], e["word_start_index"], e["word_end_index"]) for e in ents}
    assert ("john smith", 0, 2) in got
    assert ("berlin", 3, 4) in got


def test_predict_sentence_list(model):
    out = model.predict(["john smith works", "acme corp is here"])
    assert len(out) == 2
    assert any(e["span"] == "john smith" for e in out[0])
    assert any(e["span"] == "acme corp" for e in out[1])


def test_predict_list_of_token_lists(model):
    out = model.predict([["paris", "is", "nice"], ["the", "end"]])
    assert len(out) == 2
    assert any(e["label"] == "location" for e in out[0])
    assert out[1] == []


def test_predict_empty_and_errors(model):
    assert model.predict([]) == []
    with pytest.raises(ValueError):
        model.predict([""])
    with pytest.raises(ValueError):
        model.predict(12345)


def test_checkpoint_roundtrip(model, spark):
    with tempfile.TemporaryDirectory() as d:
        model.save_pretrained(d)
        loaded = SpanMarkerSparkModel.from_pretrained(d, spark)
        assert loaded.cfg.labels == model.cfg.labels
        assert loaded.gazetteer == model.gazetteer
        a = model.predict("jane doe moved to tokyo")
        b = loaded.predict("jane doe moved to tokyo")
        assert [
            (e["span"], e["label"], round(e["score"], 10)) for e in a
        ] == [(e["span"], e["label"], round(e["score"], 10)) for e in b]
