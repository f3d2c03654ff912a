"""Entity salience scoring over document-level mentions.

Not every mention matters equally: KG consumers weight facts by how
SALIENT the participating entities are in the source document, and
salience-ranked entities are the standard doc->KG summarization unit
(Dunietz & Gillick 2014, "A New Entity Salience Task"; their two
strongest features are first-mention position and mention frequency,
which is exactly the feature pair scored here). The reference
(SpanMarkerNER, span_marker/modeling.py predict()) emits flat
mention lists with no document-level weighting; this operator is the
KG-construction extension over its mention output.

Score (exact BIGINT, oracle-reproducible):
    salience_ppm = n_mentions * 1_000_000 div (pos_offset + first_pos)
i.e. frequency damped by how deep into the document the entity first
appears — first-sentence entities dominate, footer entities rank
last. Integer division keeps the value bit-identical across engines.

Scale design (100 TB): TWO thin exchanges, neither over raw text —
the (doc, entity) groupBy first (map-side-combinable, key finer than
per-doc so a mega-document cannot pin a single reducer), then the
doc-keyed window over the already-aggregated table, whose row count
is the per-doc entity vocabulary, orders of magnitude below the
mention count (plan pinned in PLANS.md: 2 exchanges, 1 sort, zero
Python stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_salience(
    mentions: DataFrame,
    doc_col: str = "url",
    entity_col: str = "span",
    pos_col: str = "doc_word_start",
    top_k: int = 5,
    pos_offset: int = 10,
) -> DataFrame:
    """Top-k salient entities per document.

    mentions: one row per mention with a document key, an entity key
    (surface span or linked entity id), and a document-level word
    position. Output per kept row:
      (doc, entity, n_mentions, first_pos, salience_ppm, rank)
    rank = row_number by (salience_ppm desc, entity asc) within the
    document — total order, deterministic cross-engine.
    """
    agg = (
        mentions.select(
            F.col(doc_col).alias("doc"),
            F.col(entity_col).alias("entity"),
            F.col(pos_col).cast("long").alias("pos"),
        )
        .groupBy("doc", "entity")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_mentions"),
            F.min("pos").alias("first_pos"),
        )
    )
    scored = agg.withColumn(
        "salience_ppm",
        F.expr(
            f"n_mentions * 1000000L div (cast({pos_offset} as bigint)"
            " + first_pos)"
        ).cast("long"),
    )
    w = Window.partitionBy("doc").orderBy(
        F.desc("salience_ppm"), F.asc("entity")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("doc").alias(doc_col),
            "entity",
            "n_mentions",
            "first_pos",
            "salience_ppm",
            "rank",
        )
    )
