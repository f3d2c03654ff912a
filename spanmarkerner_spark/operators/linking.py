"""Entity linking: broadcast alias-dictionary join + deterministic rerank.

north_star stage: candidate generation is a *broadcast hash join* of
mentions against the alias dictionary (the dictionary is small
relative to mentions — millions of aliases still broadcast in tens of
MB; if it ever outgrows broadcast, switch to a bucketed join on
alias). Rerank = mention_score * alias prior with a total tie-break
(entity_id asc) so results are order-independent; top-1 per mention
via max_by aggregation (one partial-aggregatable pass — cheaper at
scale than a row_number window, which cannot partial-aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_mentions(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """mentions x alias_dict -> linked mentions (unmatched -> null ids).

    Output = MENTIONS columns + (entity_id, canonical_name, link_score).
    """
    mention_cols = mentions.columns
    cand = mentions.join(
        F.broadcast(alias_dict),
        F.lower(mentions["span"]) == alias_dict["alias"],
        "left",
    ).withColumn("link_score", F.col("score") * F.col("prior"))

    mention_key = ["url", "sentence_id", "word_start_index"]
    # single-pass deterministic argmax: group carries the full mention
    # row through max_by, so the mentions subtree executes exactly once
    # (no join-back diamond = no recomputation of the NER stages)
    carry = [c for c in mention_cols if c not in mention_key]
    return (
        cand.groupBy(*mention_key)
        .agg(
            F.max_by(
                F.struct(*carry, "entity_id", "canonical_name", "link_score"),
                F.struct(
                    F.col("link_score").alias("s"),
                    (-F.coalesce(F.col("entity_id"), F.lit(0))).alias("t"),
                ),
            ).alias("_best")
        )
        .select(
            *mention_key,
            *[F.col(f"_best.{c}").alias(c) for c in carry],
            F.col("_best.entity_id").alias("entity_id"),
            F.col("_best.canonical_name").alias("canonical_name"),
            F.col("_best.link_score").alias("link_score"),
        )
        .select(*mention_cols, "entity_id", "canonical_name", "link_score")
    )
