"""Search primitives over the document corpus: inverted-index build,
boolean retrieval, and quantized BM25 ranking.

Inverted-index construction is the canonical MapReduce workload
(Dean & Ghemawat 2004 use it as THE example), and web-scale KG
pipelines keep a postings table beside the corpus for decontamination
lookups, benchmark-leak audits, and ad-hoc corpus forensics. BM25
(Robertson & Zaragoza 2009) is the standard lexical ranker.

Cross-engine exactness: BM25's floats (k1=1.2, b=0.75, idf, length
norm) are re-expressed in parts-per-million integer arithmetic with
floor division at every step (same contract as tfidf_topk — the
rational idf N*PPM div df is monotone in the true log idf, so top-k
order is preserved while every emitted value is bit-identical in
DuckDB). Overflow bound: score ~ idf_ppm * tf * (PPM + K1_PPM) must
stay under 2^63 — with the rational idf that caps the corpus around
N * tf < ~4 * 10^6 * max_tf at full ppm precision; beyond that, drop
idf to per-mille. Documented, asserted nowhere (the demo corpus is
5 orders below the bound).

Scale design (100 TB):
- build_postings: ONE shuffle — the (term, doc) groupBy with map-side
  partial aggregation; positions stay per-(term,doc) bounded arrays.
  Zipf-heavy terms ("the") produce hot keys a fine (term, doc) grain
  already disarms; the df side-table re-aggregates postings.
- boolean_and: semi-join world — the postings of the (few) query
  terms are filtered FIRST (partition-pruned scan if the postings
  table is written bucketed by term), then one groupBy on doc_id
  counts matched terms. The corpus is never touched.
- bm25_topk: same filtered postings + three broadcast scalars
  (n_docs, sum_dl) and the df side-table; the per-term top-k window
  runs over candidate postings only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_ws

PPM = 1_000_000
K1_PPM = 1_200_000  #: BM25 k1 = 1.2
B_PPM = 750_000     #: BM25 b = 0.75


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted index: (term, doc_id, tf, first_pos, n_pos) — term
    frequency, first token position, and occurrence count per
    posting. Terms are lowercased whitespace tokens (the corpus
    tokenization used everywhere else)."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(tokens_ws(text_col), lambda t: F.lower(t))
        ).alias("pos", "term"),
    )
    return toks.groupBy("term", id_col).agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.min("pos").cast("long").alias("first_pos"),
        F.count(F.lit(1)).cast("long").alias("n_pos"),
    )


def boolean_and(
    postings: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Conjunctive retrieval: documents containing ALL `terms`.
    Output (doc_id, n_terms, total_tf, first_pos_min); n_terms always
    equals len(terms) by construction (kept as an audit column)."""
    cand = postings.filter(F.col("term").isin(list(terms)))
    n = len(set(terms))
    return (
        cand.groupBy(id_col)
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.min("first_pos").cast("long").alias("first_pos_min"),
        )
        .filter(F.col("n_terms") == n)
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quantized BM25: top-k documents per query term.

        idf_ppm  = n_docs * PPM div df           (rational idf)
        norm_ppm = PPM - B + (B * dl * n) div sum_dl
        score    = idf_ppm * tf * (PPM + K1) div
                   (tf * PPM + (K1 * norm_ppm) div PPM)

    every step BIGINT floor arithmetic — bit-identical in DuckDB.
    Output: (term, doc_id, tf, df, dl, score, rank), rank by
    (score DESC, doc_id ASC) within term.
    """
    base = docs.select(
        F.col(id_col),
        F.transform(tokens_ws(text_col), lambda t: F.lower(t)).alias("_tk"),
    )
    lens = base.select(id_col, F.size("_tk").cast("long").alias("dl"))
    totals = lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    tf = (
        base.select(id_col, F.explode("_tk").alias("term"))
        .filter(F.col("term").isin(list(terms)))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(totals))
        .withColumn("idf_ppm", F.expr(f"n_docs * {PPM} div df").cast("long"))
        .withColumn(
            "norm_ppm",
            F.expr(
                f"{PPM} - {B_PPM} + ({B_PPM} * dl * n_docs) div sum_dl"
            ).cast("long"),
        )
        .withColumn(
            "score",
            F.expr(
                f"idf_ppm * tf * ({PPM} + {K1_PPM}) div"
                f" (tf * {PPM} + ({K1_PPM} * norm_ppm) div {PPM})"
            ).cast("long"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("term", id_col, "tf", "df", "dl", "score", "rank")
    )
