"""Label normalization: per-token tag ids -> entity span triples.

Reimplements the semantics of the reference's four normalizer
dialects (span_marker/label_normalizer.py:50-137):

  IOB/IOB2   start on B or I, end on B or O — so [B-X, I-Y] is ONE
             X entity (label from the opening tag) and a dangling I-X
             after O starts a new entity
  BIOES      start on B or S, end on B, O or S (E does NOT close; the
             entity runs to the next B/O/S or end of sentence)
  BILOU      start on B or U, end on B, O or U (same shape)
  schemeless runs of identical non-O ids

These are the exact start_ids/end_ids scans of the reference's
LabelNormalizerIOB/BIOES/BILOU (label_normalizer.py:43-95), including
their behavior on malformed sequences.

Output triples are (reduced_label_id, word_start, word_end) with end
exclusive — the reference's Entity tuple (label_normalizer.py:9-16).

Written from the scheme definitions, not translated from the
reference source. Pure functions; the Spark-side vectorized UDF and
the test oracle both call these.
"""

from __future__ import annotations

from spanmarkerner_spark.config import SpanMarkerConfig

Entity = tuple[int, int, int]  # (reduced_label_id, start, end-exclusive)


def _normalize_schemeless(tags: list[int], outside_id: int) -> list[Entity]:
    out: list[Entity] = []
    start = None
    prev = outside_id
    for i, t in enumerate(tags):
        if t != prev:
            if prev != outside_id and start is not None:
                out.append((prev, start, i))
            start = i if t != outside_id else None
            prev = t
    if prev != outside_id and start is not None:
        out.append((prev, start, len(tags)))
    return out


def _normalize_schemed(
    tags: list[int], cfg: SpanMarkerConfig, start_tags: set[str],
    end_tags: set[str],
) -> list[Entity]:
    """The reference's start_ids/end_ids scan
    (label_normalizer.py:50-67): a tag in end_tags closes any open
    entity, a tag in start_tags then opens one (S/U do both), and the
    reduced label comes from the OPENING tag — continuation tags never
    relabel or split an entity."""
    out: list[Entity] = []
    start: int | None = None
    reduced: int | None = None
    for i, t in enumerate(tags):
        lab = cfg.id2label.get(t, "O")
        tag = "O" if lab == "O" else lab[0]
        if start is not None and tag in end_tags:
            out.append((reduced, start, i))
            start = None
        if start is None and tag in start_tags:
            reduced = cfg.id2reduced_id[t]
            start = i
    if start is not None:
        out.append((reduced, start, len(tags)))
    return out


def normalize_tags(tags: list[int], cfg: SpanMarkerConfig) -> list[Entity]:
    """Dispatch on the detected scheme (factory semantics of
    label_normalizer.py:119-137)."""
    if cfg.scheme is None:
        return _normalize_schemeless(list(tags), cfg.outside_id)
    if cfg.scheme == "IOB2":
        return _normalize_schemed(tags, cfg, {"B", "I"}, {"B", "O"})
    if cfg.scheme == "BIOES":
        return _normalize_schemed(tags, cfg, {"B", "S"}, {"B", "O", "S"})
    if cfg.scheme == "BILOU":
        return _normalize_schemed(tags, cfg, {"B", "U"}, {"B", "O", "U"})
    raise ValueError(f"unknown scheme {cfg.scheme}")


def spans_to_iob2(entities: list[Entity], num_words: int, labels: list[str]) -> list[str]:
    """Inverse direction used by evaluation (evaluation.py:84-96):
    span triples -> per-token B-X/I-X/O strings."""
    out = ["O"] * num_words
    for label_id, s, e in entities:
        name = labels[label_id]
        for i in range(s, min(e, num_words)):
            out[i] = ("B-" if i == s else "I-") + name
    return out
