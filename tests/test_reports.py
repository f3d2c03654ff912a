"""Golden-pattern tests for the driver-side rendered reports:

- entity_tracker_report: regexes ported from the reference's
  tests/test_trainer.py:155-228 (entity-length, model-length, and
  combined warnings, train + evaluation phrasing) — the message text
  mirrors span_marker/tokenizer.py:66-117.
- render_model_card: full-card regex in the spirit of the reference's
  tests/model_card_pattern.py, adapted to this card's sections.
"""

from __future__ import annotations

import re

from spanmarkerner_spark.operators.metrics import (
    entity_tracker_histogram,
    entity_tracker_report,
)
from spanmarkerner_spark.operators.model_card import card_stats, render_model_card

_SPAN_SCHEMA = "k int, label string, word_start int, word_end int"


def _hist(spark, gold_rows, kept_rows):
    gold = spark.createDataFrame(gold_rows, _SPAN_SCHEMA)
    kept = spark.createDataFrame(kept_rows, _SPAN_SCHEMA) if kept_rows else (
        spark.createDataFrame([], _SPAN_SCHEMA)
    )
    return entity_tracker_histogram(gold, kept, ["k"])


def test_tracker_warning_entity_length(spark):
    # entity_max_length=1: every missed entity is longer than the cap
    gold = [(1, "PER", 0, 2), (1, "LOC", 3, 6), (2, "ORG", 0, 2), (2, "PER", 2, 3)]
    kept = [(2, "PER", 2, 3)]
    hist = _hist(spark, gold, kept)
    msg = entity_tracker_report(hist, total_num_entities=4,
                                entity_max_length=1, model_max_length=128)
    train_pattern = re.compile(
        r"This SpanMarker model will ignore [\d\.]+% of all annotated entities "
        r"in the train dataset\. This is caused by the SpanMarkerModel maximum "
        r"entity length of 1 word\.\n"
        r"These are the frequencies of the missed entities due to maximum "
        r"entity length out of \d+ total entities:"
    )
    assert train_pattern.match(msg)
    assert "- 2 missed entities with 2 words (50.000000%)" in msg
    assert "- 1 missed entities with 3 words (25.000000%)" in msg
    eval_msg = entity_tracker_report(hist, 4, 1, 128, split="evaluation")
    eval_pattern = re.compile(
        r"This SpanMarker model won't be able to predict [\d\.]+% of all "
        r"annotated entities in the evaluation dataset\."
    )
    assert eval_pattern.match(eval_msg)


def test_tracker_warning_model_length(spark):
    # all missed entities fit the entity cap -> lost to model input length
    gold = [(1, "PER", 0, 1), (1, "LOC", 5, 7), (2, "ORG", 0, 1)]
    kept = [(2, "ORG", 0, 1)]
    hist = _hist(spark, gold, kept)
    msg = entity_tracker_report(hist, total_num_entities=3,
                                entity_max_length=8, model_max_length=5)
    pattern = re.compile(
        r"This SpanMarker model will ignore [\d\.]+% of all annotated entities "
        r"in the train dataset\. This is caused by the SpanMarkerModel maximum "
        r"model input length of 5 tokens\.\n"
        r"A total of \d+ \([\d\.]+%\) entities were missed due to the maximum "
        r"input length\."
    )
    assert pattern.match(msg)


def test_tracker_warning_entity_and_model_length(spark):
    gold = [(1, "PER", 0, 1), (1, "LOC", 2, 5), (2, "ORG", 0, 1), (2, "PER", 3, 4)]
    kept = [(2, "PER", 3, 4)]
    hist = _hist(spark, gold, kept)
    msg = entity_tracker_report(hist, total_num_entities=4,
                                entity_max_length=2, model_max_length=5)
    pattern = re.compile(
        r"This SpanMarker model will ignore [\d\.]+% of all annotated entities "
        r"in the train dataset\. This is caused by the SpanMarkerModel maximum "
        r"entity length of 2 words and the maximum model input length of 5 "
        r"tokens\.\n"
        r"These are the frequencies of the missed entities due to maximum "
        r"entity length out of \d+ total entities:\n"
        r".*\nAdditionally, a total of \d+ \([\d\.]+%\) entities were missed "
        r"due to the maximum input length\.",
        re.DOTALL,
    )
    assert pattern.match(msg)


def test_tracker_no_missed_is_none(spark):
    gold = [(1, "PER", 0, 1)]
    hist = _hist(spark, gold, gold)
    assert entity_tracker_report(hist, 1, 8, 128) is None


# ---- full model card pattern ---------------------------------------

MODEL_CARD_PATTERN = re.compile(
    r"""# [\w\-]+

SpanMarker-style NER model card \(generated from the training fixture by spanmarkerner_spark\.operators\.model_card\)\.

## Training set metrics

\| Training set \| Min \| Mean \| Max \|
\|---\|---\|---\|---\|
\| Sentence length \| [\d\.]+ \| [\d\.]+ \| [\d\.]+ \|
\| Entities per sentence \| [\d\.]+ \| [\d\.]+ \| [\d\.]+ \|

## Label examples

\| Label \| Examples \|
\|---\|---\|
(\| \w+ \| .* \|
)+
## Widget examples

(\d+\. .*
)+
## Predict example

`.*`
"""
)

_ENT = "array<struct<label_id:int,word_start:int,word_end:int>>"


def _fixture(spark, n=12):
    rows = [
        ([f"tok{i}", "visited", "acme", "corp"], [(0, 0, 1), (1, 2, 4)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema=f"tokens array<string>, entities {_ENT}")


def test_full_card_matches_pattern(spark):
    stats = card_stats(_fixture(spark), labels=["PER", "ORG"], k_widget=3)
    md = render_model_card(stats, model_name="test-model")
    assert MODEL_CARD_PATTERN.match(md), md


def test_widget_numeric_ordering_past_ten(spark):
    stats = card_stats(_fixture(spark, n=12), labels=["PER", "ORG"], k_widget=12)
    md = render_model_card(stats, model_name="test-model")
    assert MODEL_CARD_PATTERN.match(md), md
    # '10.' must render after '9.' (string sort would put it after '1.')
    assert 0 < md.find("2. ") < md.find("9. ") < md.find("10. ") < md.find("12. ")
