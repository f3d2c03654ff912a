"""Phase-level timing of minhash_lsh_pairs under a chosen AQE conf
(r6 investigation): times the candidate-pair phase (everything
through the eager pairs checkpoint) separately from the verify phase.
Usage: python tools/probe_minhash_phases.py <coalesce true|false>
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coalesce = sys.argv[1]
    from pyspark.sql import functions as F

    from spanmarkerner_spark.session import get_spark

    spark = get_spark(
        app_name="probe_minhash_phases",
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": coalesce},
    )
    import __spark_entry__ as E

    docs = E._t(spark, "/root/testdata/sf0.1", "documents")
    tmp = tempfile.mkdtemp(prefix="probe_x10_")
    reps = None
    for i in range(10):
        r = docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
            "lang", "source", "n_chars",
        )
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    docs = spark.read.parquet(os.path.join(tmp, "documents.parquet"))
    docs.count()

    import spanmarkerner_spark.operators.dedup as D

    # phase split: monkey-time the checkpoint inside the operator by
    # replicating its first half verbatim (read-only probe, the
    # operator itself is untouched)
    for rep in range(2):
        num_hashes, bands, shingle_n, max_bucket = 16, 4, 3, 50
        rows_per_band = num_hashes // bands
        raw_docs = docs
        d2 = D.ensure_min_parallelism(docs)
        base = D._doc_shingles(d2, "doc_id", "text", shingle_n).withColumn(
            "sig", D.minhash_signature_from(F.col("sh"), num_hashes, "xxhash")
        )
        banded = base.select(
            "id",
            F.posexplode(F.array(*[
                F.slice("sig", b * rows_per_band + 1, rows_per_band)
                for b in range(bands)
            ])).alias("band", "band_sig"),
        ).withColumn("bucket", F.xxhash64("band", F.col("band_sig").cast("string")))
        from pyspark.sql import Window
        sized = banded.select("id", "bucket").repartition(
            spark.sparkContext.defaultParallelism, "bucket"
        ).withColumn(
            "bsz", F.count(F.lit(1)).over(Window.partitionBy("bucket"))
        ).filter(F.col("bsz") <= max_bucket)
        a = sized.select("bucket", F.col("id").alias("id_a"))
        b = sized.select("bucket", F.col("id").alias("id_b"))
        t0 = time.time()
        pairs = (
            a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        ).localCheckpoint(eager=True)
        t1 = time.time()
        n_pairs = pairs.count()
        member_ids = (
            pairs.select(F.col("id_a").alias("id"))
            .union(pairs.select(F.col("id_b").alias("id")))
            .distinct()
        )
        sets = D._doc_shingles(
            raw_docs.select(F.col("doc_id").alias("id"), F.col("text").alias("_t"))
            .join(F.broadcast(member_ids), "id", "left_semi"),
            "id", "_t", shingle_n,
        )
        joined = pairs.join(
            sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a"
        ).join(
            sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b"
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        out = (
            joined.withColumn("jaccard", F.round(inter / union, 6))
            .filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", "jaccard")
        )
        t2 = time.time()
        out.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        print(f"rep{rep} coalesce={coalesce} pairs_phase={t1-t0:.2f}s "
              f"(n={n_pairs}) verify_phase={t3-t2:.2f}s", flush=True)


if __name__ == "__main__":
    main()
