"""Column profiling — the ANALYZE/data-audit primitive.

Before any 100 TB curation run you profile the input: row count,
null share, distinct cardinality, and value range per column drive
every downstream decision (join strategy, skew salting, partition
sizing, schema sanity). Warehouse engines ship this as ANALYZE /
SUMMARIZE; this operator is the DataFrame-native equivalent over any
table, emitted as one ROW PER COLUMN so dashboards and assertions
consume it directly. The reference has no table-profiling surface
(it is a model library); this is pipeline infrastructure the
north-rule KG build needs around it.

Scale design:
- ONE scan of the input for the whole profile: every per-column
  statistic is an aggregate expression in a single `agg()`, then the
  1-row result is unpivoted driver-side into (column, stat) rows
  (constant-size, no second job).
- Exact COUNT(DISTINCT c1), COUNT(DISTINCT c2), ... in one
  aggregation makes Catalyst plan an Expand (input replicated once
  per distinct-column) — exact mode is therefore O(n_cols) scans'
  worth of shuffle mass. That is the price of exactness; at
  10^11 rows use approx=True, which swaps in HyperLogLog++
  (approx_count_distinct, one pass, no Expand, mergeable sketches;
  default rsd 5%) — the standard warehouse trade. The value oracle
  pins exact mode; the approx path is bounds-tested in pytest.
- min/max are taken over the STRING rendering of each column so the
  output schema is column-type-agnostic (one frame for any table);
  renderings of BIGINT/VARCHAR are engine-identical. Floating
  columns should be profiled via an explicit cast/round upstream
  (cross-engine float repr is not contractual).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per profiled column:
      (col_name, n_rows, n_nulls, ndv, min_str, max_str)
    n_nulls = rows where the column is NULL; ndv excludes NULLs
    (COUNT DISTINCT semantics in both engines); min_str/max_str are
    min/max of CAST(col AS STRING), NULL for all-null columns.

    approx=True replaces exact ndv with approx_count_distinct
    (HLL++, one pass, no Expand) — not oracle-exact, scale path only.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        ndv = (
            F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        )
        aggs += [
            F.count(c).cast("long").alias(f"_nn{i}"),
            ndv.cast("long").alias(f"_ndv{i}"),
            F.min(s).alias(f"_min{i}"),
            F.max(s).alias(f"_max{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args += [
            f"'{c}'",
            "_n",
            f"_n - _nn{i}",
            f"_ndv{i}",
            f"_min{i}",
            f"_max{i}",
        ]
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(stack_args)
        + ") AS (col_name, n_rows, n_nulls, ndv, min_str, max_str)"
    )
    return one.selectExpr(stack).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("ndv").cast("long").alias("ndv"),
        "min_str",
        "max_str",
    )
