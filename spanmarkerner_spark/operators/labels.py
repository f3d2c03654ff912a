"""Labelled-fixture operators: label normalization (U1) and gold-span
assignment (J1) as Spark operators.

- normalize_fixture: (tokens, ner_tags) rows -> entities column
  (array<struct<label_id,word_start,word_end>>), the four-dialect
  normalizer (span_marker/label_normalizer.py:50-137) as an
  Arrow-batched UDF over the shared pure function.
- gold_span_assignment: the reference's span->label join
  (span_marker/tokenizer.py:166-170): enumerate candidate spans,
  left-join the gold entities (default outside_id), and produce the
  anti-join residue ("missed entities" — entities longer than
  entity_max_length or beyond truncation), feeding the A2 tracker
  histogram. Pure DataFrame joins — candidates and gold are both
  keyed tables.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spanmarkerner_spark.config import SpanMarkerConfig
from spanmarkerner_spark.label_normalizer import normalize_tags

_ENT = "array<struct<label_id:int,word_start:int,word_end:int>>"


def normalize_fixture(fixture: DataFrame, cfg: SpanMarkerConfig) -> DataFrame:
    """Adds `entities` + the A1 counts (entity_count, word_count —
    label_normalizer.py:33-40)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fixture.schema.fields
    ) + f", entities {_ENT}"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["entities"] = [
                normalize_tags([int(t) for t in tags], cfg)
                for tags in pdf["ner_tags"]
            ]
            yield pdf

    normalized = fixture.mapInPandas(fn, schema=out_schema)
    return normalized.withColumn("entity_count", F.size("entities")).withColumn(
        "word_count", F.size("tokens")
    )


def gold_span_assignment(
    normalized: DataFrame, cfg: SpanMarkerConfig, key_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Returns (assigned, missed):

    assigned: one row per candidate span (key..., word_start, word_end,
    label_id) where unmatched candidates get outside_id — the J1 left
    join + coalesce.
    missed: gold entities with no matching candidate (J1 anti residue,
    tokenizer.py:228-232) — the input to the A2 tracker histogram.
    """
    L = cfg.entity_max_length
    cand = normalized.select(
        *key_cols,
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(tokens) - 1), "
                f"s -> transform(sequence(s + 1, least(size(tokens), s + {L})), "
                "e -> struct(s as word_start, e as word_end))))"
            )
        ).alias("span"),
    ).select(*key_cols, "span.word_start", "span.word_end")

    gold = normalized.select(
        *key_cols, F.explode("entities").alias("g")
    ).select(
        *key_cols,
        F.col("g.word_start").alias("word_start"),
        F.col("g.word_end").alias("word_end"),
        F.col("g.label_id").alias("label_id"),
    )
    join_keys = key_cols + ["word_start", "word_end"]
    assigned = cand.join(gold, join_keys, "left").withColumn(
        "label_id", F.coalesce("label_id", F.lit(cfg.outside_id))
    )
    missed = gold.join(cand, join_keys, "left_anti")
    return assigned, missed
