"""Relation extraction: pattern match between mention pairs.

Dependency-pattern-lite (north_star stage): for every ordered pair of
linked mentions in the same sentence with m1 strictly before m2, the
token sequence strictly between them is matched against a broadcast
predicate-pattern dictionary ("works for" -> works_for, ...).

All JVM-side: a self-join of linked mentions on (url, sentence_id) —
co-partitioned, so one shuffle total — a slice/array_join expression
for the inter-mention phrase, and a broadcast join against the
pattern dictionary. No Python in the loop.

Skew note: sentences have <= ~30 mentions, so the per-key pair
blow-up is bounded; page-level skew is handled upstream by the
url-hash repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_relations(
    linked: DataFrame, sentences: DataFrame, patterns: dict[str, str]
) -> DataFrame:
    """linked mentions + sentences(tokens) -> triples
    (subj, pred, obj, url, sentence_id)."""
    spark = linked.sparkSession
    pat = spark.createDataFrame(
        [(k, v) for k, v in patterns.items()], "phrase string, pred string"
    )
    m = linked.filter(F.col("entity_id").isNotNull()).select(
        "url", "sentence_id", "entity_id", "word_start_index", "word_end_index"
    )
    m1 = m.alias("m1")
    m2 = m.alias("m2")
    pairs = m1.join(
        m2,
        (F.col("m1.url") == F.col("m2.url"))
        & (F.col("m1.sentence_id") == F.col("m2.sentence_id"))
        & (F.col("m1.word_end_index") <= F.col("m2.word_start_index")),
    ).select(
        F.col("m1.url").alias("url"),
        F.col("m1.sentence_id").alias("sentence_id"),
        F.col("m1.entity_id").alias("subj"),
        F.col("m2.entity_id").alias("obj"),
        F.col("m1.word_end_index").alias("gap_start"),
        (F.col("m2.word_start_index") - F.col("m1.word_end_index")).alias("gap_len"),
    )
    toks = sentences.select("url", "sentence_id", "tokens")
    phrased = (
        pairs.join(toks, ["url", "sentence_id"])
        .withColumn(
            "phrase",
            F.array_join(
                F.expr("slice(tokens, gap_start + 1, gap_len)"), " "
            ),
        )
        .drop("tokens")
    )
    return phrased.join(F.broadcast(pat), "phrase").select(
        "subj", "pred", "obj", "url", "sentence_id"
    )
