"""Z-order (Morton-curve) file layout for multi-predicate skipping.

Why this exists at 10^12 triples: the graph store (`graph_store.py`)
solves JOIN locality by bucketing the edge set twice, but ad-hoc
*filter* scans — "all facts about entity X", "all inbound edges of
Y", "the (X, Y) cell" — prune files through parquet min/max footer
stats, and a table sorted linearly by `subj` gives `obj` predicates
nothing to prune with: every file's obj-range spans the whole
dictionary. Interleaving the bits of order-preserving per-column
codes (the Morton/Z curve) bounds EVERY indexed column's value range
within each file, so point/range predicates on any of the z-ordered
columns skip most files. This is the same layout contract as Delta
Lake's OPTIMIZE ZORDER BY and Iceberg's zorder sort order; parquet
directories stand in for those table formats here (no Iceberg jars
in this sandbox — same trade, see graph_store.py's identical note).

Pipeline shape (all JVM-side, one extra scan + one range shuffle):

  1. ONE `approxQuantile` pass computes 2^bits - 1 boundaries for all
     z-columns together (driver holds ncols * 255 doubles — tiny);
  2. each row's per-column code = #boundaries <= value, evaluated as
     a codegen'd `aggregate()` over a literal boundary array (no UDF,
     no per-column shuffle — this is Delta's range_partition_id
     approach with broadcast boundaries instead of a partitioner);
  3. codes are bit-interleaved into one BIGINT z-value by a static
     shift/or expression tree;
  4. `repartitionByRange(z)` + `sortWithinPartitions(z)` + write:
     one shuffle total, each output file covers a compact Z-curve
     segment, i.e. a small hyper-rectangle of the code space.

Quantile (not uniform) codes make the curve robust to skew: a hot
entity id occupies many codes' worth of boundary mass instead of
collapsing the curve onto one cell.

The intended target is the dictionary-ENCODED triple table
(`dict_store.dict_encode_triples`: s_id/o_id are dense
order-preserving BIGINTs), where z-order by (s_id, o_id) serves both
"by subject" and "by object" scans from ONE copy — complementary to
the graph store's two bucketed copies, which keep zero-Exchange
joins. Evidence: tests/test_layout.py pins, via parquet footer
min/max stats, that the non-leading column prunes most files under
z-order and nothing under a linear sort.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _code_expr(col: str, boundaries: list[float]) -> Column:
    """#boundaries <= value, as a codegen'd aggregate over a literal
    array — an order-preserving int code in [0, len(boundaries)]."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    v = F.col(col).cast("double")
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(v >= b, F.lit(1)).otherwise(F.lit(0)),
    )


def _interleave(codes: list[Column], bits: int) -> Column:
    """Morton z-value: bit i of column j lands at position
    i * ncols + (ncols - 1 - j), so column 0 owns the most
    significant bit of each group (column order = priority order)."""
    n = len(codes)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(codes):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + (n - 1 - j)))
    return z


def zorder_values(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append a `_z` column: the Morton interleave of quantile-coded
    `cols`. One approxQuantile scan (all columns in a single pass),
    then pure expressions."""
    if not (1 <= bits <= 16):
        raise ValueError(f"bits={bits} outside [1, 16]")
    if not cols:
        raise ValueError("z-order needs at least one column")
    probs = [k / (1 << bits) for k in range(1, 1 << bits)]
    quantiles = df.approxQuantile(cols, probs, 0.001)
    codes = []
    for col, bounds in zip(cols, quantiles):
        # dedupe: heavy skew can repeat a boundary; aggregate() counts
        # each once so duplicates would waste code space, not break
        # ordering — dropping them keeps codes dense
        uniq = sorted(set(bounds))
        codes.append(_code_expr(col, uniq))
    return df.withColumn("_z", _interleave(codes, bits))


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write `df` as parquet laid out along the Z curve of `cols`:
    one range shuffle on `_z`, one local sort, `n_files` files each
    covering a compact curve segment."""
    (
        zorder_values(df, cols, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_bounds(path: str, cols: list[str]) -> dict[str, dict[str, tuple]]:
    """Per-file (min, max) of each column from parquet footer stats —
    the same metadata a scan's file-skipping consults. Driver-side by
    nature (footers only, no data pages)."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, tuple]] = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        bounds: dict[str, tuple] = {}
        for col in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            bounds[col] = (lo, hi)
        out[name] = bounds
    return out


def pruned_fraction(
    bounds: dict[str, dict[str, tuple]], col: str, value
) -> float:
    """Fraction of files whose [min, max] footer range EXCLUDES
    `value` — i.e. what a point predicate on `col` skips."""
    if not bounds:
        return 0.0
    skipped = sum(
        1 for b in bounds.values() if not (b[col][0] <= value <= b[col][1])
    )
    return skipped / len(bounds)
