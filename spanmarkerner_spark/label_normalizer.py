"""Label normalization: per-token tag ids -> entity span triples.

Reimplements the semantics of the reference's four normalizer
dialects (span_marker/label_normalizer.py:50-137):

  IOB/IOB2   B-X starts, I-X continues (I-X after O/other label also
             starts a new entity — lenient IOB2, matching the
             reference's scan which closes on label change)
  BIOES      B-X..E-X spans, S-X singletons
  BILOU      B-X..L-X spans, U-X singletons
  schemeless runs of identical non-O ids

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
    tags: list[int], cfg: SpanMarkerConfig, begin: set[str], inside: set[str],
    last: set[str], unit: set[str],
) -> list[Entity]:
    out: list[Entity] = []
    cur_label: int | None = None
    start = 0

    def flush(end: int) -> None:
        nonlocal cur_label
        if cur_label is not None:
            out.append((cur_label, start, end))
            cur_label = None

    for i, t in enumerate(tags):
        lab = cfg.id2label.get(t, "O")
        if lab == "O":
            flush(i)
            continue
        tag, reduced = lab[0], cfg.id2reduced_id[t]
        if tag in unit:
            flush(i)
            out.append((reduced, i, i + 1))
        elif tag in begin:
            flush(i)
            cur_label, start = reduced, i
        elif tag in inside or tag in last:
            if cur_label is None or cur_label != reduced:
                # dangling/label-switching I: treat as a new start
                flush(i)
                cur_label, start = reduced, i
            if tag in last:
                flush(i + 1)
    flush(len(tags))
    return out


def normalize_tags(tags: list[int], cfg: SpanMarkerConfig) -> list[Entity]:
    """Dispatch on the detected scheme (factory semantics of
    label_normalizer.py:119-137)."""
    if cfg.scheme is None:
        return _normalize_schemeless(list(tags), cfg.outside_id)
    if cfg.scheme == "IOB2":
        return _normalize_schemed(tags, cfg, {"B"}, {"I"}, set(), set())
    if cfg.scheme == "BIOES":
        return _normalize_schemed(tags, cfg, {"B"}, {"I"}, {"E"}, {"S"})
    if cfg.scheme == "BILOU":
        return _normalize_schemed(tags, cfg, {"B"}, {"I"}, {"L"}, {"U"})
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
