"""Cross-encoder rerank for entity linking — the north_star's
"candidate generation via broadcast alias-dictionary hash join +
cross-encoder rerank in vectorized UDFs" stage, completing
operators/linking.py (whose prior-based argmax stays the cheap
default inside the KG pipeline).

The cross-encoder is a deterministic numpy stand-in sharing the
TinySpanEncoder's seeded embedding table (the container has no torch
— same documented constraint as model.py): each (mention-in-context,
candidate) pair is scored by an interaction of the two sides'
mean-pooled embeddings, NOT a precomputable per-side vector — i.e.
the defining data-access pattern of a cross-encoder (every candidate
pair must be scored jointly, so the work is |pairs|, and the Spark
job shapes around that):

- Candidate generation stays a broadcast hash join (mentions never
  shuffle); the pair table is the explosion, typically 1-5 cands per
  mention.
- Scoring runs in `mapInPandas` over Arrow batches — one numpy
  matmul per batch, no per-row python. Scores are per-row pure
  (independent of batch composition), so results are identical for
  any partitioning/batch size — pinned by the parity test against
  the single-process twin `cross_score_py`.
- Final rerank: argmax of cross_score * prior per mention via the
  same single-pass max_by as linking.py.

At 100 TB the pair table is the hot path: it carries only (mention
key, span, context tokens, candidate name, prior) — never the page
text — and the scorer is compute-bound Arrow batches, the same
profile as the NER stage the pipeline already scales.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SpanMarkerConfig
from ..subword import piece_id, word_pieces

_DT = np.float32


def _tok_ids(text: str, vocab: int) -> list[int]:
    ids: list[int] = []
    for w in text.lower().split():
        for p in word_pieces(w):
            ids.append(piece_id(p, vocab))
    return ids


def _emb_table(cfg: SpanMarkerConfig) -> np.ndarray:
    # the SAME seeded table the NER encoder uses (model.py init order:
    # emb is drawn first, so a fresh RNG reproduces it without
    # instantiating the full encoder)
    rng = np.random.RandomState(cfg.seed)
    s = 1.0 / np.sqrt(cfg.hidden_size)
    return rng.normal(0, s, (cfg.vocab_size, cfg.hidden_size)).astype(_DT)


def _mean_emb(texts, emb: np.ndarray, vocab: int) -> np.ndarray:
    out = np.zeros((len(texts), emb.shape[1]), _DT)
    for i, t in enumerate(texts):
        ids = _tok_ids(t or "", vocab)
        if ids:
            out[i] = emb[np.asarray(ids)].mean(axis=0)
    return out


def cross_score_py(
    pairs: list[tuple[str, str]], cfg: SpanMarkerConfig
) -> list[float]:
    """Single-process twin of the distributed scorer — float32
    sigmoid(interaction / sqrt(d)) of mean-pooled embeddings of
    (mention+context, candidate name). Per-row pure."""
    emb = _emb_table(cfg)
    a = _mean_emb([p[0] for p in pairs], emb, cfg.vocab_size)
    b = _mean_emb([p[1] for p in pairs], emb, cfg.vocab_size)
    z = (a * b).sum(axis=1) / _DT(np.sqrt(cfg.hidden_size))
    return (1.0 / (1.0 + np.exp(-z, dtype=_DT))).astype(_DT).tolist()


def score_pairs(
    cand: DataFrame,
    cfg: SpanMarkerConfig,
    left_col: str = "mention_text",
    right_col: str = "canonical_name",
    out_col: str = "cross_score",
) -> DataFrame:
    """Arrow-batched cross-encoder scoring: adds `out_col` float."""
    from pyspark.sql.types import FloatType, StructField, StructType

    # copy — StructType.add would mutate cand's cached schema in place
    schema = StructType(
        list(cand.schema.fields) + [StructField(out_col, FloatType())]
    )
    cfg_bcast = cfg  # dataclass, pickled into the closure once per worker

    def run(batches: Iterator) -> Iterator:
        emb = _emb_table(cfg_bcast)
        for pdf in batches:
            a = _mean_emb(pdf[left_col].tolist(), emb, cfg_bcast.vocab_size)
            b = _mean_emb(pdf[right_col].tolist(), emb, cfg_bcast.vocab_size)
            z = (a * b).sum(axis=1) / _DT(np.sqrt(cfg_bcast.hidden_size))
            pdf[out_col] = (1.0 / (1.0 + np.exp(-z, dtype=_DT))).astype(_DT)
            yield pdf

    return cand.mapInPandas(run, schema=schema)


def link_mentions_cross(
    mentions: DataFrame, alias_dict: DataFrame, cfg: SpanMarkerConfig
) -> DataFrame:
    """linking.link_mentions with the cross-encoder in the rerank:
    candidates via broadcast alias join, joint (mention, candidate)
    scoring in mapInPandas, argmax of cross_score * prior with the
    same total tie-break. Output = mentions + (entity_id,
    canonical_name, link_score, cross_score)."""
    mention_cols = mentions.columns
    cand = mentions.join(
        F.broadcast(alias_dict),
        F.lower(mentions["span"]) == alias_dict["alias"],
        "left",
    ).withColumn(
        "mention_text",
        F.concat_ws(" ", F.col("span"), F.coalesce(F.col("sentence"), F.lit("")))
        if "sentence" in mention_cols
        else F.col("span"),
    )
    scored = score_pairs(cand, cfg).withColumn(
        "link_score", F.col("cross_score") * F.col("prior")
    )
    mention_key = ["url", "sentence_id", "word_start_index"]
    carry = [c for c in mention_cols if c not in mention_key]
    extras = ["entity_id", "canonical_name", "link_score", "cross_score"]
    return (
        scored.groupBy(*mention_key)
        .agg(
            F.max_by(
                F.struct(*carry, *extras),
                F.struct(
                    F.col("link_score").alias("s"),
                    (-F.coalesce(F.col("entity_id"), F.lit(0))).alias("t"),
                ),
            ).alias("_best")
        )
        .select(
            *mention_key,
            *[F.col(f"_best.{c}").alias(c) for c in carry],
            *[F.col(f"_best.{c}").alias(c) for c in extras],
        )
        .select(*mention_cols, *extras)
    )
