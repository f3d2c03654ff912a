#!/usr/bin/env python3
"""Generate the expected-output parquet fixtures for the 4 kg_* driver
queries, by running the single-process reference-semantics oracle
(spanmarkerner_spark/oracle.py — mirrors span_marker/modeling.py:354-578
predict flow) over EXACTLY the input __spark_entry__._kg_input builds:
documents at the given sf-dir reshaped as pages, unioned with the 200
deterministic synthetic pages (gen_pages(200, seed=42)).

The driver's DuckDB oracle SQL for kg_mentions / kg_mentions_context /
kg_triples / kg_triples_canonical reads these fixtures with
read_parquet(), turning the former rows-only checks into full
rows+schema+hash checks against an independent (single-process, no
Spark dataflow) implementation.

Regenerate with:

    python tools/gen_kg_fixtures.py --sf-dir /root/testdata/sf0.01

Determinism: the oracle is pure python/numpy over deterministic inputs
(seeded synthetic pages + driver-generated parquet), so re-running
produces byte-identical fixtures.
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MENTION_COLS = [
    ("url", pa.string()),
    ("sentence_id", pa.int32()),
    ("span", pa.string()),
    ("label", pa.string()),
    ("word_start_index", pa.int32()),
    ("word_end_index", pa.int32()),
    ("char_start_index", pa.int32()),
    ("char_end_index", pa.int32()),
]
TRIPLE_COLS = [
    ("subj", pa.int64()),
    ("pred", pa.string()),
    ("obj", pa.int64()),
    ("url", pa.string()),
    ("sentence_id", pa.int32()),
]
DOC_ENTITY_COLS = [
    ("url", pa.string()),
    ("doc_word_start", pa.int32()),
    ("doc_word_end", pa.int32()),
    ("span", pa.string()),
    ("label", pa.string()),
]


def load_pages(sf_dir: str) -> list[tuple]:
    """documents -> pages tuples, mirroring __spark_entry__._docs_as_pages
    + the synthetic union in _kg_input."""
    import duckdb

    from spanmarkerner_spark.datagen import gen_pages

    con = duckdb.connect()
    docs = con.sql(
        "SELECT 'doc://' || doc_id AS url, text, lang "
        f"FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    urls = [u for u, _, _ in docs]
    assert len(set(urls)) == len(urls), "duplicate doc urls would hit dedupe_pages"
    pages = [(u, None, None, t, lg) for u, t, lg in docs]
    return pages + gen_pages(200, seed=42)


def mentions_table(mentions: list[dict]) -> pa.Table:
    rows = sorted(
        tuple(m[c] for c, _ in MENTION_COLS) for m in mentions
    )
    return pa.table(
        {c: pa.array([r[i] for r in rows], type=t)
         for i, (c, t) in enumerate(MENTION_COLS)}
    )


def triples_table(triples: set[tuple]) -> pa.Table:
    rows = sorted(triples)
    return pa.table(
        {c: pa.array([r[i] for r in rows], type=t)
         for i, (c, t) in enumerate(TRIPLE_COLS)}
    )


def doc_entities_table(pages: list[tuple], mentions: list[dict]) -> pa.Table:
    """Doc-level entity rows: each mention's word indices shifted by
    the total word count of the doc's prior non-blank sentences — the
    single-process twin of spacy_integration.doc_entities_flat
    (reference: span_marker/spacy_integration.py:152-158)."""
    offsets: dict[tuple[str, int], int] = {}
    for url, _ts, _html, text, _lang in pages:
        acc = 0
        for sid, raw in enumerate(text.split(" . ")):
            if not raw.strip():
                continue  # blank segments are not sentences: 0 words
            offsets[(url, sid)] = acc
            acc += len(raw.split(" "))
    rows = sorted(
        (
            m["url"],
            m["word_start_index"] + offsets[(m["url"], m["sentence_id"])],
            m["word_end_index"] + offsets[(m["url"], m["sentence_id"])],
            m["span"],
            m["label"],
        )
        for m in mentions
    )
    return pa.table(
        {c: pa.array([r[i] for r in rows], type=t)
         for i, (c, t) in enumerate(DOC_ENTITY_COLS)}
    )


LINKED_CROSS_COLS = [
    ("url", pa.string()),
    ("sentence_id", pa.int32()),
    ("word_start_index", pa.int32()),
    ("span", pa.string()),
    ("entity_id", pa.int64()),
]


def linked_cross_table(mentions: list[dict], cfg) -> pa.Table:
    """Single-process twin of operators/rerank.link_mentions_cross
    over pipeline mentions (no sentence column -> mention_text is the
    span): argmax of cross_score * prior, tie -> lower entity_id."""
    from spanmarkerner_spark.datagen import alias_rows
    from spanmarkerner_spark.operators.rerank import cross_score_py

    by_alias: dict[str, list[tuple]] = {}
    for alias, eid, name, prior in alias_rows():
        by_alias.setdefault(alias, []).append((eid, name, prior))

    rows = []
    for m in mentions:
        cands = by_alias.get(m["span"].lower(), [])
        best = None
        if cands:
            scores = cross_score_py([(m["span"], name) for _, name, _ in cands], cfg)
            for (eid, _name, prior), cs in zip(cands, scores):
                key = (cs * prior, -eid)
                if best is None or key > best[0]:
                    best = (key, eid)
        rows.append(
            (m["url"], m["sentence_id"], m["word_start_index"], m["span"],
             best[1] if best else None)
        )
    rows.sort(key=lambda r: tuple((v is None, v) for v in r))
    return pa.table(
        {c: pa.array([r[i] for r in rows], type=t)
         for i, (c, t) in enumerate(LINKED_CROSS_COLS)}
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None,
                    help="fixture dir (default fixtures/kg/<sf-dir basename>)")
    args = ap.parse_args()

    from spanmarkerner_spark.config import KG_LABELS, SpanMarkerConfig
    from spanmarkerner_spark.oracle import run_oracle

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "fixtures", "kg",
        os.path.basename(args.sf_dir.rstrip("/")),
    )
    os.makedirs(out, exist_ok=True)
    cfg = SpanMarkerConfig(labels=KG_LABELS)
    pages = load_pages(args.sf_dir)
    print(f"{len(pages)} pages from {args.sf_dir} + synthetic")

    plain = run_oracle(pages, cfg, use_extracted=False)
    pq.write_table(mentions_table(plain["mentions"]),
                   os.path.join(out, "mentions.parquet"))
    pq.write_table(triples_table(plain["triples"]),
                   os.path.join(out, "triples.parquet"))
    from spanmarkerner_spark.datagen import (
        RELATION_ADVERBS,
        RELATION_PATTERNS_RICH,
    )
    from spanmarkerner_spark.oracle import oracle_triples_rich

    rich = oracle_triples_rich(
        plain["linked"], dict(RELATION_PATTERNS_RICH), list(RELATION_ADVERBS)
    )
    pq.write_table(triples_table(rich),
                   os.path.join(out, "triples_rich.parquet"))
    print(f"triples_rich={len(rich)}")
    pq.write_table(doc_entities_table(pages, plain["mentions"]),
                   os.path.join(out, "doc_entities.parquet"))
    print(f"mentions={len(plain['mentions'])} triples={len(plain['triples'])}")
    pq.write_table(linked_cross_table(plain["mentions"], cfg),
                   os.path.join(out, "linked_cross.parquet"))
    print("linked_cross written")

    canon = run_oracle(pages, cfg, use_extracted=False, canonicalize=True)
    pq.write_table(triples_table(canon["triples"]),
                   os.path.join(out, "triples_canonical.parquet"))
    print(f"triples_canonical={len(canon['triples'])}")

    ctx = run_oracle(pages, cfg, use_extracted=False, doc_context_window=2)
    pq.write_table(mentions_table(ctx["mentions"]),
                   os.path.join(out, "mentions_ctx.parquet"))
    print(f"mentions_ctx={len(ctx['mentions'])}")
    print(f"fixtures written to {os.path.abspath(out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
