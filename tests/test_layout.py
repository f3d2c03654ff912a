"""Z-order layout: footer-stats pruning evidence + content identity.

Pins the claim in plans/layout.py: under a linear sort by the leading
column, the second column's min/max spans ~the whole domain in every
file (a point predicate on it prunes nothing), while the Morton
layout bounds BOTH columns per file, so the same predicate skips most
files — the multi-predicate file-skipping a 10^12-row encoded triple
table needs for "all facts about X" AND "all inbound edges of Y"
scans over one copy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanmarkerner_spark.plans.layout import (
    file_column_bounds,
    pruned_fraction,
    zorder_values,
    zorder_write,
)

N_FILES = 16


@pytest.fixture(scope="module")
def encoded(spark):
    # synthetic dictionary-encoded edge table: ids dense in [0, 4096),
    # endpoints decorrelated via a hash so every s_id neighborhood's
    # o_ids span the whole domain — the worst case for a linear
    # layout, the normal case for a real edge table
    return spark.range(0, 60_000).select(
        (F.col("id") % 4096).alias("s_id"),
        F.pmod(F.xxhash64("id"), F.lit(4096)).alias("o_id"),
        (F.col("id") % 17).alias("p_id"),
    )


def test_zorder_prunes_both_columns(spark, encoded, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    lin, zed = str(base / "linear"), str(base / "zorder")
    (
        encoded.repartitionByRange(N_FILES, "s_id")
        .sortWithinPartitions("s_id")
        .write.mode("overwrite")
        .parquet(lin)
    )
    zorder_write(encoded, ["s_id", "o_id"], zed, n_files=N_FILES)

    lb = file_column_bounds(lin, ["s_id", "o_id"])
    zb = file_column_bounds(zed, ["s_id", "o_id"])
    assert len(lb) == len(zb) == N_FILES

    probes = [400, 1100, 1900, 2700, 3500]
    lin_s = sum(pruned_fraction(lb, "s_id", v) for v in probes) / len(probes)
    lin_o = sum(pruned_fraction(lb, "o_id", v) for v in probes) / len(probes)
    z_s = sum(pruned_fraction(zb, "s_id", v) for v in probes) / len(probes)
    z_o = sum(pruned_fraction(zb, "o_id", v) for v in probes) / len(probes)

    # linear: leading column prunes nearly everything, second column
    # prunes ~nothing (every file's o_id range spans ~the full domain;
    # <=0.05 tolerates a file whose hashed min/max misses a probe)
    assert lin_s >= 0.9
    assert lin_o <= 0.05
    # z-order: BOTH columns prune most files; the curve trades a
    # little leading-column selectivity for non-zero selectivity on
    # every indexed column
    assert z_s >= 0.5
    assert z_o >= 0.5

    # layout must not change content
    a = encoded.orderBy("s_id", "o_id", "p_id").collect()
    b = (
        spark.read.parquet(zed)
        .orderBy("s_id", "o_id", "p_id")
        .collect()
    )
    assert a == b


def test_zorder_value_is_pure_expressions(spark, encoded):
    # the z computation must stay JVM-side: no BatchEvalPython /
    # ArrowEvalPython stages in the plan (UDFs are the slow path)
    plan = (
        zorder_values(encoded, ["s_id", "o_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_zorder_skew_robust(spark):
    # 90% of rows on one hot s_id: quantile codes spread the hot key
    # across boundary mass so files still split the data evenly
    # (uniform-width codes would put 90% of rows in one code cell)
    df = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 4096)
        .alias("s_id"),
        ((F.col("id") * 57 + 11) % 4096).alias("o_id"),
    )
    z = zorder_values(df, ["s_id", "o_id"])
    sizes = (
        z.repartitionByRange(8, "_z")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    assert max(counts) <= 3 * (20_000 // 8)


def test_zorder_validates_args(spark, encoded):
    with pytest.raises(ValueError):
        zorder_values(encoded, [])
    with pytest.raises(ValueError):
        zorder_values(encoded, ["s_id"], bits=0)
