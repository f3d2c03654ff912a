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

from pyspark.sql import DataFrame, Window
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


def alias_prior(
    linked: DataFrame,
    surface_col: str = "span",
    entity_col: str = "entity_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Build the alias→entity commonness dictionary FROM the linked
    corpus — the closing half of the entity-linking loop: the
    broadcast alias dictionary used for candidate generation
    (link_mentions) is, in production KG construction, *derived* from
    link statistics over the crawl itself (anchor-text commonness
    prior a la TagMe/WAT: p(entity | surface) = links(surface,
    entity) / links(surface)). This operator computes that table so
    the next pipeline epoch can bootstrap its candidate dictionary
    from the current epoch's links.

    Output per (surface, entity): (surface, entity_id, n_links,
    n_surface, prior_ppm, rank) — prior quantized to exact BIGINT ppm
    (n_links * scale DIV n_surface), rank by (n_links desc, entity_id
    asc) within surface, total and deterministic.

    Scale design (100 TB): the input projection is two thin columns;
    the groupBy partial-aggregates map-side, so the exchange carries
    (surface, entity) pairs — vocabulary-sized, zipf-thin — not
    mention rows. The per-surface window then repartitions only the
    aggregated dictionary (tiny relative to the corpus). Hot
    surfaces ("apple") have bounded distinct-entity fan-out, so the
    window partitions are small by construction.
    """
    m = linked.filter(F.col(entity_col).isNotNull()).select(
        F.lower(F.col(surface_col)).alias("surface"),
        F.col(entity_col).alias("entity_id"),
    )
    counts = m.groupBy("surface", "entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_links")
    )
    w = Window.partitionBy("surface")
    return (
        counts.withColumn(
            "n_surface", F.sum("n_links").over(w).cast("long")
        )
        .withColumn(
            "rank",
            F.row_number()
            .over(w.orderBy(F.desc("n_links"), F.asc("entity_id")))
            .cast("long"),
        )
        .withColumn(
            "prior_ppm", F.expr(f"n_links * {scale} div n_surface")
        )
        .select(
            "surface", "entity_id", "n_links", "n_surface",
            "prior_ppm", "rank",
        )
    )
