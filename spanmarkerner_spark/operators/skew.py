"""Skew-aware joins: explicit salting for hot keys.

AQE's skew-join splitting handles sort-merge skew at runtime, but the
canonicalization self-joins and alias-posting joins have *planned*
skew (Zipfian entity popularity — a handful of keys hold most rows).
Salting spreads one hot key across `salt` sub-keys: the heavy side
gets a random-but-deterministic salt per row, the light side is
replicated `salt` times. Equivalent join result, `salt`x better
balance on the hot keys.

All expressions, no UDF; the salt is pmod(xxhash64(...), salt) so
reruns are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    heavy: DataFrame,
    light: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Join heavy x light on column `on` with the light side exploded
    across `salt` replicas. Output columns = heavy.* + light.* minus
    the duplicate key.

    salt_by: columns of the heavy side used to derive the per-row
    salt (defaults to all of the heavy side's columns - deterministic,
    so checkpoint-resume reproduces identical partitioning).

    how is restricted to inner/left/left_semi: the light side is
    replicated `salt` times, so right/full/left_anti would emit each
    unmatched light row once per replica — not equivalent to the
    unsalted join.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, got {how!r}: the "
            "replicated light side would duplicate unmatched rows under "
            "right/full/anti joins"
        )
    cols = salt_by or [c for c in heavy.columns]
    h = heavy.withColumn(
        "_salt", F.pmod(F.xxhash64(*cols), F.lit(salt)).cast("int")
    )
    l = light.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = h.join(l, [on, "_salt"], how)
    return out.drop("_salt")


def top_keys(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """Hot-key report: the n heaviest keys with counts — feed this to
    decide salt factors (or to split hot keys into a broadcast-side
    map join, the classic two-path skew pattern)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(key))
        .limit(n)
    )


def skew_split_join(
    heavy: DataFrame,
    light: DataFrame,
    on: str,
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Two-path join: keys above hot_threshold join via broadcast of
    the (tiny) hot slice of the light side; the long tail joins
    normally. Union of both paths == plain join, without a single
    monster partition. This is the pattern for the alias-dictionary
    join when a few aliases ('usa', 'google') dominate mentions."""
    hot = (
        heavy.groupBy(on)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") >= hot_threshold)
        .select(on)
    )
    heavy_hot = heavy.join(F.broadcast(hot), on, "left_semi")
    heavy_tail = heavy.join(F.broadcast(hot), on, "left_anti")
    light_hot = light.join(F.broadcast(hot), on, "left_semi")
    hot_joined = heavy_hot.join(F.broadcast(light_hot), on)
    tail_joined = heavy_tail.join(light, on)
    return hot_joined.unionByName(tail_joined)
