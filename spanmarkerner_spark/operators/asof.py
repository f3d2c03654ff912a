"""As-of join — an operator Spark lacks natively.

For each left row, attach the LATEST right row of the same key with
right.ts <= left.ts (the time-series point-in-time join; DuckDB/kdb
call it ASOF JOIN).

Spark-first implementation (no UDF, no range-join blowup): tag both
sides, UNION, one window per key ordered by (ts, side, tiebreak), and
carry the most recent right-side payload with last(ignorenulls) over
an unbounded-preceding frame — a single shuffle on the key and one
partition-local sort, O(n log n) per key instead of the naive
inequality-join's O(n_left * n_right). At 100 TB this is the same
shape as any windowed aggregation: shuffle by key (salt hot keys via
operators/skew.py if needed), stream within partitions.

Ties: right rows at ts equal to the left ts DO match (<=); among
right rows sharing (key, ts) the one with the greatest tiebreak wins
(deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Returns left.* plus the payload columns of the as-of-matched
    right row (null when no right row precedes). `tiebreak` orders
    right rows sharing (key, ts); defaults to the first payload col."""
    tiebreak = tiebreak or payload_cols[0]
    l_tag = left.select(
        key,
        ts,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in payload_cols],
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tag = right.select(
        key,
        ts,
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
        F.col(tiebreak).alias("_tb"),
        F.lit(None)
        .cast(l_tag.schema["_l"].dataType)
        .alias("_l"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (<= semantics), and
    # among right rows the greatest tiebreak sorts last => its payload
    # is what last(ignorenulls) carries
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in payload_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m_{c}").alias(f"asof_{c}") for c in payload_cols],
    )
    return out
