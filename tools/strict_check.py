"""Strict replica of the driver's correctness gate.

The driver materializes both the Spark result and the DuckDB oracle
result as *pandas* frames, canonicalizes (columns sorted by name, rows
sorted by all columns), and hashes the values. That hash is dtype
sensitive: Spark DECIMAL -> pandas object(decimal.Decimal) while DuckDB
DECIMAL -> float64, so equal values can still hash-mismatch.

This checker enforces the strongest condition that makes any
reasonable driver hash pass: identical dtypes, identical values
(pandas .equals), and identical CSV byte serialization.

Usage: python tools/strict_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import io
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def frame_info(df: pd.DataFrame):
    c = canon(df)
    buf = io.StringIO()
    c.to_csv(buf, index=False)
    return c, hashlib.sha256(buf.getvalue().encode()).hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as entrymod
    from spanmarkerner_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # point the kg fixture oracles at this scale's expected rows
    os.environ["SMN_KG_FIXTURE_SF"] = os.path.basename(sf_dir.rstrip("/"))

    spark = get_spark(app_name="strict_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} SPARK-ERR {type(e).__name__}: {e}")
            bad.append(name)
            continue
        if name not in oracles:
            # rows-only: just exercise the canonicalizer like the driver does
            try:
                c, h = frame_info(spdf)
                print(f"{name:24s} rows-only rows={len(c)} hash={h} "
                      f"({time.time()-t0:.1f}s)")
                if len(c) == 0:
                    print(f"  !! {name}: zero rows (vacuous)")
                    bad.append(name)
            except Exception as e:  # noqa: BLE001
                print(f"{name:24s} CANON-ERR {type(e).__name__}: {e}")
                bad.append(name)
            continue
        try:
            dkdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} DUCK-ERR {type(e).__name__}: {e}")
            bad.append(name)
            continue
        cs, hs = frame_info(spdf)
        cd, hd = frame_info(dkdf)
        ok_shape = cs.shape == cd.shape
        ok_dtype = ok_shape and list(map(str, cs.dtypes)) == list(map(str, cd.dtypes))
        ok_vals = ok_dtype and cs.equals(cd)
        ok_hash = hs == hd
        status = "OK" if (ok_vals and ok_hash) else "FAIL"
        print(f"{name:24s} {status} rows={len(cs)}/{len(cd)} "
              f"hash={hs}/{hd} ({time.time()-t0:.1f}s)")
        if status == "FAIL":
            bad.append(name)
            if not ok_shape:
                print(f"  shape {cs.shape} vs {cd.shape}")
            elif not ok_dtype:
                print("  dtypes spark:", dict(zip(cs.columns, map(str, cs.dtypes))))
                print("  dtypes duck :", dict(zip(cd.columns, map(str, cd.dtypes))))
            else:
                neq = (cs != cd) & ~(cs.isna() & cd.isna())
                rows = neq.any(axis=1)
                print("  first diff rows (spark / duck):")
                print(cs[rows].head(3))
                print(cd[rows].head(3))
    print("----")
    print("FAILING:", bad if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
