"""Deterministic numpy stand-in for the SpanMarker scoring model.

The reference scores candidate spans by (1) collating each sample into
a fixed-width tensor with start/end *marker* tokens appended after the
text, marker position-ids copying their span endpoints' positions
(+2, the PL-Marker trick), and a block-structured attention matrix
(span_marker/data_collator.py:52-130); then (2) running a transformer
encoder and classifying the concatenated (start-marker, end-marker)
hidden states (span_marker/modeling.py:125-205).

No torch/transformers in this container, so the encoder is a tiny
deterministic numpy transformer (seeded weights) + a broadcast
gazetteer feature that makes predictions meaningful on the synthetic
corpus. The *dataflow contract* — marker layout, position ids,
attention blocks, per-pair classification, softmax scores — is
faithful to the reference; the learned weights are a stand-in.

Everything here is pure numpy and shared verbatim by the Spark
mapInPandas UDF and the single-process oracle, so any pipeline/oracle
mismatch isolates a *dataflow* bug, not a math bug.
"""

from __future__ import annotations

import numpy as np

from spanmarkerner_spark.config import SpanMarkerConfig
from spanmarkerner_spark.subword import END_MARKER_ID, PAD_ID, START_MARKER_ID

GAZ_BONUS = 8.0
OUTSIDE_BONUS = 4.0


class TinySpanEncoder:
    """One-layer transformer encoder + marker-pair classifier with
    weights drawn once from a seeded RNG (same on every executor)."""

    def __init__(self, cfg: SpanMarkerConfig):
        self.cfg = cfg
        d = cfg.hidden_size
        rng = np.random.RandomState(cfg.seed)
        s = 1.0 / np.sqrt(d)
        self.emb = rng.normal(0, s, (cfg.vocab_size, d))
        # position ids run 0..model_max_length+2 (text positions +2)
        self.pos = rng.normal(0, s, (cfg.model_max_length + 3, d))
        self.wq = rng.normal(0, s, (d, d))
        self.wk = rng.normal(0, s, (d, d))
        self.wv = rng.normal(0, s, (d, d))
        self.wo = rng.normal(0, s, (d, d))
        self.w1 = rng.normal(0, s, (d, 2 * d))
        self.w2 = rng.normal(0, s, (2 * d, d))
        self.cls_w = rng.normal(0, s, (2 * d, cfg.num_reduced_labels))
        self.cls_b = np.zeros(cfg.num_reduced_labels)

    def forward(
        self,
        input_ids: np.ndarray,      # (B, T) int
        position_ids: np.ndarray,   # (B, T) int
        attn_mask: np.ndarray,      # (B, T, T) bool
    ) -> np.ndarray:                # (B, T, d) float64
        h = self.emb[input_ids] + self.pos[position_ids]
        q, k, v = h @ self.wq, h @ self.wk, h @ self.wv
        scores = (q @ k.transpose(0, 2, 1)) / np.sqrt(h.shape[-1])
        scores = np.where(attn_mask, scores, -1e30)
        scores -= scores.max(axis=-1, keepdims=True)
        w = np.exp(scores)
        w = w / w.sum(axis=-1, keepdims=True)
        h = h + (w @ v) @ self.wo
        h = h + np.maximum(h @ self.w1, 0.0) @ self.w2
        # parameter-free layernorm keeps activations bounded
        h = (h - h.mean(axis=-1, keepdims=True)) / (
            h.std(axis=-1, keepdims=True) + 1e-6
        )
        return h


def collate(
    rows: list[dict], cfg: SpanMarkerConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch materialization mirroring data_collator.py:52-130.

    Each row dict needs: input_ids, start_position_ids,
    end_position_ids (token positions of each span's first/last
    subword). Returns (input_ids, position_ids, attn_mask,
    start_marker_idx, num_pairs) padded to cfg.total_size.
    """
    B, T = len(rows), cfg.total_size
    input_ids = np.full((B, T), PAD_ID, dtype=np.int64)
    position_ids = np.zeros((B, T), dtype=np.int64)
    attn = np.zeros((B, T, T), dtype=bool)
    start_idx = np.zeros(B, dtype=np.int64)
    num_pairs = np.zeros(B, dtype=np.int64)
    for b, row in enumerate(rows):
        ids = row["input_ids"][: cfg.model_max_length]
        n = len(ids)
        sp = row["start_position_ids"]
        ep = row["end_position_ids"]
        m = min(len(sp), cfg.marker_max_length)
        # markers start right after the text, rounded up to even
        # (data_collator.py:64-75 — the v1.0.0 "+40%" layout)
        m0 = n + (n % 2)
        input_ids[b, :n] = ids
        input_ids[b, m0 : m0 + m] = START_MARKER_ID
        input_ids[b, m0 + m : m0 + 2 * m] = END_MARKER_ID
        # PL-Marker position trick: text at pos+2; markers copy their
        # span endpoint's token position (+2) (data_collator.py:79-87)
        position_ids[b, :n] = np.arange(2, n + 2)
        position_ids[b, m0 : m0 + m] = np.asarray(sp[:m]) + 2
        position_ids[b, m0 + m : m0 + 2 * m] = np.asarray(ep[:m]) + 2
        # block attention (data_collator.py:90-102): text<->text,
        # markers->text, marker pair j mutually visible + self
        attn[b, :n, :n] = True
        attn[b, m0 : m0 + 2 * m, :n] = True
        for j in range(m):
            a, z = m0 + j, m0 + m + j
            attn[b, a, a] = attn[b, z, z] = True
            attn[b, a, z] = attn[b, z, a] = True
        start_idx[b] = m0
        num_pairs[b] = m
    return input_ids, position_ids, attn, start_idx, num_pairs


def score_batch(
    encoder: TinySpanEncoder,
    rows: list[dict],
    gazetteer: dict[str, int],
    cfg: SpanMarkerConfig,
) -> list[tuple[list[int], list[float]]]:
    """Collate + forward + marker-pair classification + softmax
    (modeling.py:512-530 analogue). Each row dict additionally needs
    ``span_texts`` (lower-cased surface form per candidate span) for
    the gazetteer feature. Returns per row: (label_ids, scores)."""
    if not rows:
        return []
    input_ids, position_ids, attn, start_idx, num_pairs = collate(rows, cfg)
    h = encoder.forward(input_ids, position_ids, attn)
    out: list[tuple[list[int], list[float]]] = []
    for b, row in enumerate(rows):
        m0, m = int(start_idx[b]), int(num_pairs[b])
        feats = np.concatenate([h[b, m0 : m0 + m], h[b, m0 + m : m0 + 2 * m]], axis=1)
        logits = feats @ encoder.cls_w + encoder.cls_b  # (m, L)
        for j, text in enumerate(row["span_texts"][:m]):
            gl = gazetteer.get(text)
            if gl is not None:
                logits[j, gl] += GAZ_BONUS
            else:
                logits[j, cfg.outside_id] += OUTSIDE_BONUS
        z = logits - logits.max(axis=-1, keepdims=True)
        probs = np.exp(z)
        probs /= probs.sum(axis=-1, keepdims=True)
        label_ids = probs.argmax(axis=-1)
        scores = probs[np.arange(len(label_ids)), label_ids]
        out.append((label_ids.astype(int).tolist(), scores.tolist()))
    return out


def greedy_decode(
    spans: list[tuple[int, int, int, float]], outside_id: int
) -> list[tuple[int, int, int, float]]:
    """Greedy non-overlap selection (modeling.py:540-574 semantics):
    sort by score desc with a total (start, end) tie-break — making
    the reference's stable-sort behavior order-independent under
    Spark — accept a span iff no word in [start, end) is taken, emit
    sorted by start. spans: (start, end, label_id, score)."""
    kept: list[tuple[int, int, int, float]] = []
    taken: set[int] = set()
    for s, e, lab, sc in sorted(spans, key=lambda x: (-x[3], x[0], x[1])):
        if lab == outside_id:
            continue
        if any(w in taken for w in range(s, e)):
            continue
        taken.update(range(s, e))
        kept.append((s, e, lab, sc))
    kept.sort(key=lambda x: (x[0], x[1]))
    return kept
