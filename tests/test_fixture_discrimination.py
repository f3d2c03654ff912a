"""The kg fixtures must DISCRIMINATE the pipeline modes (round-3
verdict: base/context and plain/canonical fixtures hashed identical,
so those driver rows would have passed even if doc_context_window or
canonicalize were silently ignored).

Reference behavior at stake: the reference's document-context mode
measurably changes predictions (span_marker/trainer.py:278-366;
README CoNLL03 93.1 -> 94.4 F1), and canonicalization must actually
merge ambiguous entity ids.
"""

import os

import pyarrow.parquet as pq
import pytest

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "kg", "sf0.01")


def _rows(fname):
    t = pq.read_table(os.path.join(FIX, fname))
    return set(map(tuple, zip(*[t.column(c).to_pylist() for c in t.column_names])))


def test_context_fixture_differs_from_base():
    base, ctx = _rows("mentions.parquet"), _rows("mentions_ctx.parquet")
    assert base != ctx, "context mode changed nothing — vacuous differential"
    # the deterministic probe page is the guaranteed flip site
    probe = {r for r in base ^ ctx if "probe/context" in r[0]}
    assert probe, "symmetric difference does not include the probe page"


def test_canonical_fixture_differs_from_base():
    base, canon = _rows("triples.parquet"), _rows("triples_canonical.parquet")
    assert base != canon, "canonicalize changed nothing — vacuous differential"


def test_canonical_merges_shared_alias_pair():
    """'apex' is an alias of both acme corp (1007) and stark labs
    (1011): canonical triples must contain NO 1011 and the base must
    contain at least one (otherwise the merge is untested)."""
    base, canon = _rows("triples.parquet"), _rows("triples_canonical.parquet")
    base_1011 = [r for r in base if r[0] == 1011 or r[2] == 1011]
    canon_1011 = [r for r in canon if r[0] == 1011 or r[2] == 1011]
    assert base_1011, "entity 1011 never appears in base triples"
    assert not canon_1011, "canonicalization left unmerged 1011 ids"


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_fixture_scales_exist(sf):
    """oracle_sql() resolves the fixture dir from SMN_KG_FIXTURE_SF;
    every driver-visible scale must have generated fixtures so the
    tri-scale strict gate never silently compares across scales."""
    d = os.path.join(os.path.dirname(FIX), sf)
    assert os.path.isfile(os.path.join(d, "mentions.parquet")), (
        f"missing fixtures for {sf}: regenerate with "
        f"python tools/gen_kg_fixtures.py --sf-dir /root/testdata/{sf}"
    )


def test_rich_triples_strict_superset_of_plain():
    """The rich matcher keeps every plain match (plain patterns are
    the inverted=False subset; adverb filtering is a no-op on
    adverb-free gaps) and adds inverse/adverb matches — both feature
    classes must be non-vacuously present in the fixture corpus."""
    plain = _rows("triples.parquet")
    rich = _rows("triples_rich.parquet")
    assert plain <= rich
    assert len(rich) > len(plain), "no inverse/adverb sentence matched"
