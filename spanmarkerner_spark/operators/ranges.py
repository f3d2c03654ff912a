"""Bucketized range join — the scalable form of
`point BETWEEN start AND end` joins.

A naive inequality join of points x intervals is a per-key cartesian
product (Spark plans BroadcastNestedLoopJoin or a key-equi join with a
post-filter whose matching work is still O(points * intervals) per
key). The standard fix: quantize time into fixed-width buckets, explode
each interval to the buckets it covers, and equi-join on
(key, bucket) — the join only touches bucket-co-located pairs, then an
exact BETWEEN filter removes edge misses. Work scales with
(interval_len / bucket_width) per interval instead of the product.

Each (point, interval) pair appears at most once: a point lives in
exactly one bucket, an interval covers it in one exploded row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketized_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_seconds: int = 1800,
) -> DataFrame:
    """points(key, ts, ...) x intervals(key, start_ts, end_ts, ...) ->
    matched rows (inner) with all columns of both sides, for
    start <= ts <= end. Pick bucket_seconds near the typical interval
    length: wider wastes filter work, narrower explodes more rows."""
    p = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(ts)) / bucket_seconds)
    )
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(end)) / bucket_seconds),
            )
        ),
    )
    return (
        p.join(i, [key, "_bucket"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_bucket")
    )
