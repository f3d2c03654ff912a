"""Coreference-lite pronoun resolution for KG construction.

Web-scale KG pipelines lose a large fraction of relation recall to
pronominal subjects ("Acme bought Globex. *It* then fired the CEO."):
the span extractor only sees named mentions. The standard cheap fix —
used long before neural coref, e.g. the Stanford dcoref sieve's
pronominal pass (Lee et al. 2011) — resolves each pronoun to the
NEAREST PRECEDING entity mention in the same document, which is
right often enough to be the default recall lever in production
extraction stacks.

Spark-first shape: this is exactly a `last(payload, ignorenulls=True)`
running window over the per-document token order — mentions carry a
payload, pronouns carry null, and each pronoun reads the most recent
non-null payload strictly before it. ONE shuffle (the per-document
window partition); no join, no iteration, no UDF.

Reference provenance: the reference (SpanMarkerNER,
span_marker/modeling.py predict()) emits independent per-sentence
entities and has no document-level coreference; this operator is the
KG-construction extension over its mention output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_pronouns(
    mentions: DataFrame,
    pronouns: DataFrame,
    doc_col: str = "url",
    sent_col: str = "sentence_id",
    pos_col: str = "pos",
    entity_col: str = "entity_id",
    span_col: str = "span",
    max_sent_distance: int | None = None,
) -> DataFrame:
    """Resolve each pronoun to the nearest preceding linked mention.

    mentions: one row per linked entity mention —
      (doc, sent, pos, entity_id, span); rows with a null entity_id
      must be filtered out by the caller (unlinked mentions are not
      valid antecedents, and pre-filtering keeps every payload column
      non-null on the same rows so the per-column `last` calls all
      read from the same row).
    pronouns: one row per pronoun occurrence — (doc, sent, pos).

    Output, one row per RESOLVED pronoun:
      (doc, sent, pos, entity_id, antecedent_span, antecedent_sent,
       sent_distance)
    Pronouns with no preceding mention in their document (or farther
    than max_sent_distance sentences back, if set) are dropped —
    unresolved pronouns are not KG evidence.

    Scale design (100 TB): the union is map-side; the only exchange
    is the window partition on the document key — the same
    fine-grained key every per-doc stage in the pipeline shuffles on,
    so AQE coalesces it with neighbours. Payloads are thin (entity
    id + span string); document token text never enters the plan.
    """
    m = mentions.select(
        F.col(doc_col),
        F.col(sent_col).cast("long").alias("_sent"),
        F.col(pos_col).cast("long").alias("_pos"),
        F.col(entity_col).cast("long").alias("_ent"),
        F.col(span_col).alias("_span"),
        F.lit(0).alias("_is_pron"),
    )
    p = pronouns.select(
        F.col(doc_col),
        F.col(sent_col).cast("long").alias("_sent"),
        F.col(pos_col).cast("long").alias("_pos"),
        F.lit(None).cast("long").alias("_ent"),
        F.lit(None).cast("string").alias("_span"),
        F.lit(1).alias("_is_pron"),
    )
    # at an identical (sent, pos) — possible only with degenerate
    # input — the mention sorts first and is antecedent-eligible
    w = (
        Window.partitionBy(doc_col)
        .orderBy("_sent", "_pos", "_is_pron")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = (
        m.unionByName(p)
        .withColumn("_a_ent", F.last("_ent", ignorenulls=True).over(w))
        .withColumn("_a_span", F.last("_span", ignorenulls=True).over(w))
        .withColumn(
            "_a_sent",
            F.last(
                F.when(F.col("_ent").isNotNull(), F.col("_sent")),
                ignorenulls=True,
            ).over(w),
        )
        .filter((F.col("_is_pron") == 1) & F.col("_a_ent").isNotNull())
    )
    if max_sent_distance is not None:
        r = r.filter(
            F.col("_sent") - F.col("_a_sent") <= F.lit(max_sent_distance)
        )
    return r.select(
        F.col(doc_col),
        F.col("_sent").alias(sent_col),
        F.col("_pos").alias(pos_col),
        F.col("_a_ent").alias(entity_col),
        F.col("_a_span").alias("antecedent_span"),
        F.col("_a_sent").alias("antecedent_sent"),
        (F.col("_sent") - F.col("_a_sent")).cast("long").alias("sent_distance"),
    )
