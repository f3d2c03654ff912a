"""Property-based tests (hypothesis) for the pure kernels, plus a
brute-force python oracle for asof_join semantics — SURVEY.md §5's
"oracle per operator" strategy applied to the hardest-to-eyeball ops.
Pure-function properties run hypothesis at full example counts; the
Spark-backed oracle check runs once on a seeded randomized input
(per-example Spark jobs would be prohibitively slow).
"""

from __future__ import annotations

import datetime as dt
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from spanmarkerner_spark.model import greedy_decode
from spanmarkerner_spark.operators.context import context_merge

# ---- greedy_decode ---------------------------------------------------

spans_strategy = st.lists(
    st.tuples(
        st.integers(0, 30),                      # start
        st.integers(1, 8),                       # length
        st.integers(0, 4),                       # label id (0 = outside)
        st.floats(0, 1, allow_nan=False, width=32),
    ).map(lambda t: (t[0], t[0] + t[1], t[2], float(t[3]))),
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(spans_strategy)
def test_greedy_decode_no_overlap_and_sorted(spans):
    kept = greedy_decode(spans, outside_id=0)
    # no outside labels, no overlapping words, output sorted by start
    taken = set()
    assert kept == sorted(kept, key=lambda x: (x[0], x[1]))
    for s, e, lab, _sc in kept:
        assert lab != 0
        assert not any(w in taken for w in range(s, e))
        taken.update(range(s, e))


@settings(max_examples=100, deadline=None)
@given(spans_strategy)
def test_greedy_decode_order_invariant(spans):
    """The decode must not depend on input ordering (Spark shuffles
    deliver candidates in arbitrary order)."""
    shuffled = list(spans)
    random.Random(0).shuffle(shuffled)
    assert greedy_decode(spans, 0) == greedy_decode(shuffled, 0)


@settings(max_examples=100, deadline=None)
@given(spans_strategy)
def test_greedy_decode_maximal(spans):
    """Greedy is maximal: no rejected non-outside span fits in the
    leftover word set."""
    kept = greedy_decode(spans, 0)
    taken = {w for s, e, _, _ in kept for w in range(s, e)}
    kept_set = set(kept)
    for s, e, lab, sc in spans:
        if lab == 0 or (s, e, lab, sc) in kept_set:
            continue
        # a rejected span must collide with a kept word... unless an
        # identical-key duplicate was kept instead
        assert any(w in taken for w in range(s, e))


# ---- context_merge ---------------------------------------------------

ids = st.lists(st.integers(0, 1000), min_size=2, max_size=20)


@settings(max_examples=200, deadline=None)
@given(ids, st.lists(ids, max_size=3), st.lists(ids, max_size=3),
       st.integers(4, 64))
def test_context_merge_budget_and_prefix(own, prevs, nexts, budget):
    merged, prefix = context_merge(own, prevs, nexts, budget)
    # layout contract: [CLS] prev-context body next-context [SEP] —
    # context splices INSIDE the specials, body intact, shifted by
    # exactly `prefix` (the position-id shift the scorer applies)
    assert merged[0] == own[0] and merged[-1] == own[-1]
    body = own[1:-1]
    assert merged[1 + prefix : 1 + prefix + len(body)] == body
    # never exceeds the budget unless own alone already does
    if len(own) <= budget:
        assert len(merged) <= budget
    assert 0 <= prefix <= len(merged) - len(own)


# ---- asof_join vs brute force ---------------------------------------

def _brute_asof(left_rows, right_rows):
    """Reference semantics: latest right (ts <= left.ts, ts not NULL)
    per key; ties on ts -> greatest tiebreak; payload from THAT row."""
    out = {}
    for k, lts, eid in left_rows:
        best = None
        for rk, rts, pid, val in right_rows:
            if rk != k or rts is None or rts > lts:
                continue
            cand = (rts, pid)
            if best is None or cand > best[0]:
                best = (cand, pid, val)
        out[eid] = (best[1], best[2]) if best else (None, None)
    return out


def test_asof_join_matches_brute_force(spark):
    rnd = random.Random(123)
    T0 = dt.datetime(2024, 1, 1)

    def ts():
        return T0 + dt.timedelta(minutes=rnd.randint(0, 200))

    left_rows = [(rnd.randint(1, 6), ts(), i) for i in range(120)]
    right_rows = [
        (
            rnd.randint(1, 6),
            None if rnd.random() < 0.1 else ts(),
            i,
            None if rnd.random() < 0.25 else float(i),
        )
        for i in range(80)
    ]
    from spanmarkerner_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        left_rows, "user_id long, ts timestamp, event_id long"
    )
    right = spark.createDataFrame(
        right_rows, "user_id long, ts timestamp, p_id long, value double"
    )
    got = {
        r["event_id"]: (r["asof_p_id"], r["asof_value"])
        for r in asof_join(
            left, right, "user_id", "ts", ["p_id", "value"], tiebreak="p_id"
        ).collect()
    }
    assert got == _brute_asof(left_rows, right_rows)


# ---- label_normalizer IOB2 roundtrip ---------------------------------

from spanmarkerner_spark.config import SpanMarkerConfig
from spanmarkerner_spark.label_normalizer import normalize_tags, spans_to_iob2

IOB2_CFG = SpanMarkerConfig(
    labels=["O", "B-PER", "I-PER", "B-LOC", "I-LOC", "B-ORG", "I-ORG"]
)


@st.composite
def span_layouts(draw):
    """Sorted, non-overlapping (possibly adjacent) labeled spans."""
    n_words = draw(st.integers(1, 40))
    spans, pos = [], 0
    while pos < n_words and draw(st.booleans()):
        start = draw(st.integers(pos, n_words - 1))
        end = draw(st.integers(start + 1, n_words))
        label = draw(st.integers(1, len(IOB2_CFG.reduced_labels) - 1))
        spans.append((label, start, end))
        pos = end
    return n_words, spans


@settings(max_examples=300, deadline=None)
@given(span_layouts())
def test_iob2_roundtrip(layout):
    """spans -> IOB2 strings -> normalize_tags recovers the spans
    exactly — including ADJACENT same-label spans, which the B- tag
    must keep apart (the reason IOB2 exists)."""
    n_words, spans = layout
    tags_str = spans_to_iob2(spans, n_words, IOB2_CFG.reduced_labels)
    tag_ids = [IOB2_CFG.label2id[t] for t in tags_str]
    assert normalize_tags(tag_ids, IOB2_CFG) == spans


# ---- subword char-span alignment -------------------------------------

from spanmarkerner_spark.subword import encode_words

words_strategy = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Zs", "Cc", "Cs")),
        min_size=1, max_size=12,
    ),
    min_size=1, max_size=25,
)


@settings(max_examples=200, deadline=None)
@given(words_strategy)
def test_encode_words_char_spans_slice_back(words):
    """word_char_start/end must slice the reconstructed sentence back
    to each encoded word — the byte-identity the KG mentions rely on
    for char offsets."""
    e = encode_words(words, vocab_size=4096, model_max_length=64)
    sent = " ".join(words)
    for i in range(e["num_words"]):
        assert sent[e["word_char_start"][i]:e["word_char_end"][i]] == words[i]


# ---- round-5 wave operators: seeded randomized python oracles --------


def test_extract_links_matches_python_contract(spark):
    """One randomized batch of hrefs (schemes, fragments, relative
    forms) through extract_links vs a python replica of the module's
    normalization contract."""
    from spanmarkerner_spark.operators.linkgraph import extract_links

    rng = random.Random(7)
    pieces = ["https://x.org/a", "http://y.io/b?q=1", "/root/p",
              "rel/p", "mailto:a@b.c", "javascript:void(0)", "",
              "//proto.rel/x", "/only#frag", "https://z.net/#f2"]
    hrefs = [rng.choice(pieces) + (f"#s{i}" if rng.random() < 0.3 else "")
             for i in range(200)]
    rows = [
        (f"https://host{i % 7}.example.com/page{i}", None,
         f'<a href="{h}">t{i}</a>'.encode(), "", "en")
        for i, h in enumerate(hrefs)
    ]
    from spanmarkerner_spark import schemas

    pages = spark.createDataFrame(rows, schema=schemas.PAGES)
    got = {(r["src_url"], r["dst_url"]) for r in
           extract_links(pages).collect()}

    def norm(src, href):
        href = href.split("#")[0]
        if href.startswith(("https://", "http://")):
            return href
        if href.startswith("/"):
            scheme_host = src.split("/", 3)
            return f"{scheme_host[0]}//{scheme_host[2]}" + href
        return None

    want = set()
    for i, h in enumerate(hrefs):
        src = f"https://host{i % 7}.example.com/page{i}"
        d = norm(src, h)
        if d:
            want.add((src, d))
    assert got == want


def test_bm25_matches_python_oracle(spark):
    """Seeded random corpus; python integer replica of the exact ppm
    formula must match Spark value-for-value."""
    from spanmarkerner_spark.operators.search import (
        PPM, B_PPM, K1_PPM, bm25_topk,
    )

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 30))))
            for i in range(40)]
    terms = ["alpha", "beta"]
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["term"], r["doc_id"]): r["score"]
           for r in bm25_topk(sdf, terms, k=1000).collect()}

    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    sum_dl = sum(len(v) for v in toks.values())
    want = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        for i, v in toks.items():
            tf = v.count(term)
            if not tf:
                continue
            idf = n * PPM // df
            norm_ppm = PPM - B_PPM + (B_PPM * len(v) * n) // sum_dl
            score = (idf * tf * (PPM + K1_PPM)) // (
                tf * PPM + (K1_PPM * norm_ppm) // PPM
            )
            want[(term, i)] = score
    assert got == want


def test_hits_matches_python_oracle(spark):
    """Seeded random digraph; python integer replica of the
    normalized half-steps must match Spark value-for-value."""
    from spanmarkerner_spark.operators.graph import hits

    rng = random.Random(3)
    nodes = [f"n{i}" for i in range(12)]
    edges = {(rng.choice(nodes), rng.choice(nodes)) for _ in range(40)}
    edges = sorted((s, d) for s, d in edges if s != d)
    sdf = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: (r["authority"], r["hub"])
           for r in hits(sdf, iters=2, scale=10**6).collect()}

    ns = sorted({s for s, _ in edges} | {d for _, d in edges})
    h = {v: 10**6 // len(ns) for v in ns}
    a = {}
    for _ in range(2):
        raw = {}
        for s, d in edges:
            raw[d] = raw.get(d, 0) + h[s]
        t = sum(raw.values())
        a = {v: r * 10**6 // t for v, r in raw.items()}
        raw = {}
        for s, d in edges:
            if d in a:
                raw[s] = raw.get(s, 0) + a[d]
        t = sum(raw.values())
        h = {v: r * 10**6 // t for v, r in raw.items()}
    want = {v: (a.get(v, 0), h.get(v, 0)) for v in ns}
    assert got == want


def test_salience_matches_python_oracle(spark):
    """Seeded random mentions; python replica of the exact ppm score
    and the (score DESC, entity ASC) top-k must match."""
    from spanmarkerner_spark.operators.salience import entity_salience

    rng = random.Random(13)
    rows = [
        (f"d{rng.randint(0, 5)}", f"e{rng.randint(0, 8)}",
         rng.randint(0, 120))
        for _ in range(300)
    ]
    sdf = spark.createDataFrame(rows, ["url", "span", "doc_word_start"])
    got = {(r["url"], r["entity"]): (r["salience_ppm"], r["rank"])
           for r in entity_salience(sdf, top_k=3).collect()}

    agg = {}
    for d, e, p in rows:
        n, fp = agg.get((d, e), (0, None))
        agg[(d, e)] = (n + 1, p if fp is None else min(fp, p))
    by_doc = {}
    for (d, e), (n, fp) in agg.items():
        by_doc.setdefault(d, []).append((e, n * 1_000_000 // (10 + fp)))
    want = {}
    for d, ents in by_doc.items():
        for rank, (e, s) in enumerate(
            sorted(ents, key=lambda t: (-t[1], t[0]))[:3], 1
        ):
            want[(d, e)] = (s, rank)
    assert got == want


def test_source_rollup_matches_python_oracle(spark):
    """Seeded random corpus; python replica of the Gopher flags and
    the corpus-exact per-source means must match value-for-value."""
    from spanmarkerner_spark.operators.corpus_stats import (
        GOPHER_STOPWORDS,
        source_rollup,
    )

    rng = random.Random(17)
    vocab = ["the", "a", "solid", "word", "lexeme", "tokenization"]
    docs = [
        (i, " ".join(rng.choice(vocab)
                     for _ in range(rng.randint(1, 80))),
         f"s{i % 4}")
        for i in range(60)
    ]
    sdf = spark.createDataFrame(docs, ["doc_id", "text", "source"])
    got = {r["source"]: (r["n_docs"], r["n_pass"], r["pass_ppm"],
                         r["sum_words"], r["mean_wl_ppm"])
           for r in source_rollup(sdf).collect()}

    per_src = {}
    for _i, text, src in docs:
        toks = text.split()
        nw, swl = len(toks), sum(len(t) for t in toks)
        mw = swl * 1_000_000 // nw if nw else 0
        ns = len(set(toks) & set(GOPHER_STOPWORDS))
        ok = int(50 <= nw <= 100_000 and 3_000_000 <= mw <= 10_000_000
                 and ns >= 2)
        d = per_src.setdefault(src, [0, 0, 0, 0])
        d[0] += 1
        d[1] += ok
        d[2] += nw
        d[3] += swl
    want = {
        s: (n, p, p * 1_000_000 // n, w,
            (c * 1_000_000 // w if w else 0))
        for s, (n, p, w, c) in per_src.items()
    }
    assert got == want


def test_anchor_prior_matches_python_oracle(spark):
    """Seeded random links; python replica of the ppm shares."""
    from spanmarkerner_spark.operators.linkgraph import anchor_prior

    rng = random.Random(23)
    rows = [
        (f"https://s{rng.randint(0, 4)}.org/p{i}",
         f"https://t{rng.randint(0, 3)}.net/x",
         rng.choice(["here", "acme", "more"]))
        for i in range(200)
    ]
    sdf = spark.createDataFrame(rows, ["src_url", "dst_url", "anchor"])
    got = {(r["anchor"], r["dst_host"]): (r["n"], r["n_anchor"],
                                          r["prior_ppm"])
           for r in anchor_prior(sdf).collect()}

    cnt = {}
    for _s, d, a in rows:
        host = d.split("//")[1].split("/")[0]
        cnt[(a, host)] = cnt.get((a, host), 0) + 1
    tot = {}
    for (a, _h), n in cnt.items():
        tot[a] = tot.get(a, 0) + n
    want = {(a, h): (n, tot[a], n * 1_000_000 // tot[a])
            for (a, h), n in cnt.items()}
    assert got == want


# ---- dense_ids (dictionary id assignment) ----------------------------


def test_dense_ids_matches_python_sorted_rank_unicode(spark):
    """Seeded randomized unicode vocabulary (mixed scripts, combining
    marks, astral-plane codepoints): dense_ids must equal the python
    sorted() rank — Spark's UTF8 binary string ordering and python's
    codepoint ordering agree for valid UTF-8, which this pins."""
    from spanmarkerner_spark.plans.dict_store import dense_ids

    rnd = random.Random(424242)
    alphabet = (
        "abcXYZ019 _-:/" "äöüßéñç" "αβγΩ" "русский" "中文字" "🌍🚀"
        "́é"
    )
    vocab = list({
        "".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 12)))
        for _ in range(400)
    })
    rows = [(v,) for v in vocab]
    rnd.shuffle(rows)
    df = spark.createDataFrame(rows, "term string").repartition(9)
    for buckets in (3, 16):
        got = {
            r["term"]: r["tid"]
            for r in dense_ids(df, "term", buckets=buckets).collect()
        }
        want = {v: i + 1 for i, v in enumerate(sorted(vocab))}
        assert got == want, f"buckets={buckets}"
