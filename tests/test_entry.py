"""Mirror of the driver's correctness gate: run every queries() entry
and compare against its oracle_sql() through DuckDB — row count,
column names, and order-insensitive values."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("ENTRY_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return None  # pandas materializes SQL NULL as nan
        return round(val, 6)
    try:
        import decimal

        if isinstance(val, decimal.Decimal):
            return round(float(val), 6)
    except Exception:
        pass
    return val


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_normalize(r[i]) for i in idx) for r in rows]
    # None-safe total order (rollup/outer-join rows contain nulls)
    normed.sort(key=lambda r: tuple((v is None, str(v)) for v in r))
    return normed, [cols[i] for i in idx]


@pytest.fixture(scope="module")
def duck():
    con = _duck(SF_DIR)
    yield con
    con.close()


ORACLED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLED))

# fixture-backed oracles are generated for the DRIVER's correctness
# scale (sf0.01, tools/gen_kg_fixtures.py) — run those queries at that
# scale regardless of the (faster) default SF_DIR used for the rest
FIXTURE_SF = "/root/testdata/sf0.01"
FIXTURE_PINNED = {
    n for n, sql in entrymod.oracle_sql().items() if "fixtures/kg" in sql
}


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, FIXTURE_SF if name in FIXTURE_PINNED else SF_DIR)
    scols = sdf.columns
    spdf = sdf.toPandas()
    srows = [tuple(r) for r in spdf.itertuples(index=False)]
    res = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    dkdf = res.df()
    drows = dkdf.values.tolist()
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    s_set, _ = _rowset(scols, srows)
    d_set, _ = _rowset(dcols, drows)
    assert len(s_set) == len(d_set), f"{name}: rowcount {len(s_set)} vs {len(d_set)}"
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if not _rows_equal(a, b)
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
    # the driver's gate is STRICTER than tolerant value equality: it
    # hashes the canonicalized *materialized pandas frames* — enforce
    # the same here so dtype drift (DECIMAL/HUGEINT/timestamp-unit)
    # fails in CI and not only in tools/strict_check.py
    from tools.strict_check import frame_info

    _, hs = frame_info(spdf)
    _, hd = frame_info(dkdf)
    assert hs == hd, f"{name}: canonical frame hash mismatch {hs} vs {hd}"


def _rows_equal(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-6, abs_tol=1e-6):
                return False
        elif x != y:
            return False
    return True


def test_every_query_is_value_oracled():
    """Contract: ZERO rows-only queries — every registered query has a
    DuckDB value oracle (the strongest driver signal). A new query
    added without an oracle fails here instead of silently degrading
    to the weaker rows-only check."""
    assert ROWS_ONLY == [], f"queries missing oracles: {ROWS_ONLY}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_registration_order_no_dupes_and_rotation_coverage():
    """The driver checks the FIRST 50 registered queries. Pins:
    (a) no name appears twice in the ordering; (b) every query with
    no green driver row in any prior round's CORRECTNESS file sits
    inside the 50-row window (the r4 verdict rotation rule)."""
    import glob
    import json
    import os

    names = entrymod._ordered_names()
    assert len(names) == len(set(names))
    assert sorted(names) == sorted(entrymod.queries())
    seen = set()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r0*.json"))):
        with open(f) as fh:
            for k, v in json.load(fh).items():
                if v.get("hash_match") and not v.get("err"):
                    seen.add(k)
    never = [n for n in names[50:] if n not in seen]
    # late additions may sit outside the window ONLY if explicitly
    # declared for next-round rotation (strict-local green required
    # by the gate; the list must stay small and must not hide names)
    allowed = set(getattr(entrymod, "_NEXT_ROTATION", []))
    # bound chosen so the queue stays one round's worth of rotation:
    # the round-6 window frees ~40 slots once r5 rows land (the
    # 50-row cap comfortably covers the queue even after the
    # twelfth-wave additions)
    assert len(allowed) <= 16, f"_NEXT_ROTATION too large: {sorted(allowed)}"
    assert set(allowed) <= set(names), "_NEXT_ROTATION names must be registered"
    leak = [n for n in never if n not in allowed]
    assert leak == [], f"never-driver-green queries outside window: {leak}"
