"""A/B harness for AQE-coalescing conf variants on the x10 minhash
path (r6 investigation): builds the 10x-replica documents table once,
then times minhash_lsh_pairs under the conf the session was built
with. Usage:

    python tools/probe_minhash_aqe.py <coalesce> [minPartitionSize]

e.g. `probe_minhash_aqe.py true 64k`, `probe_minhash_aqe.py false`.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coalesce = sys.argv[1]
    extra = {"spark.sql.adaptive.coalescePartitions.enabled": coalesce}
    if len(sys.argv) > 2:
        extra["spark.sql.adaptive.coalescePartitions.minPartitionSize"] = sys.argv[2]
    from pyspark.sql import functions as F

    from spanmarkerner_spark.session import get_spark

    spark = get_spark(app_name="probe_minhash_aqe", extra_conf=extra)
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

    from spanmarkerner_spark.operators.dedup import minhash_lsh_pairs

    for label, fn in [("xxhash", "xxhash"), ("md5", "portable")]:
        trials = []
        for _ in range(2):
            t0 = time.time()
            minhash_lsh_pairs(
                docs, num_hashes=16, bands=4, jaccard_threshold=0.5,
                max_bucket=50, hash_fn=fn,
            ).write.format("noop").mode("overwrite").save()
            trials.append(round(time.time() - t0, 2))
        print(f"minhash_{label:7s} coalesce={coalesce} "
              f"{extra.get('spark.sql.adaptive.coalescePartitions.minPartitionSize','-'):>5s} "
              f"best={min(trials):5.2f} trials={trials}", flush=True)


if __name__ == "__main__":
    main()
