"""SparkSession factory tuned for this engine.

Local-mode testing uses local[N]; the same conf block is what we'd
ship with spark-submit on a real cluster (AQE on, Arrow on, sensible
shuffle parallelism). Session TZ pinned to UTC so results compare
bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make spanmarkerner_spark importable on executors — the local
    equivalent of `spark-submit --py-files pkg.zip` (north_rule). In
    local mode workers inherit the driver env only at fork, so a
    driver-side sys.path tweak is NOT enough; addPyFile works in both
    local and cluster mode."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # imported from a zip: spark-submit --py-files already
        # distributed exactly this archive to every executor
        _SHIPPED.add(key)
        return
    tmp = tempfile.mkdtemp(prefix="smns_pyfiles_")
    zip_path = shutil.make_archive(
        os.path.join(tmp, "spanmarkerner_spark_pkg"),
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir),
    )
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)


def get_spark(
    app_name: str = "spanmarkerner_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # one BLAS thread per python worker — N workers already saturate
    # the cores; nested BLAS threading only adds contention
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    # route the scorer's multi-MB numpy temporaries through a brk heap
    # that never shrinks: with default glibc, every batch re-mmaps and
    # re-faults ~40MB (and under 32 workers those faults contend on
    # cgroup page-charging — measured 7-8s sys per worker). MMAP_MAX=0
    # + a high trim threshold cut minor faults 10x and zeroed sys time
    # (do NOT set MMAP_THRESHOLD_ instead — measured worse: it keeps
    # trim-at-top refaulting alive).
    os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(512 << 20))
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores) if str(cores).isdigit() else 32, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # byte-based post-shuffle coalescing is wrong for this engine:
        # its per-byte compute is ~1000x typical SQL (interpreted HOF
        # chains, Arrow-UDF stages), so AQE's byte heuristic
        # serializes compute-dense stages behind byte-small exchanges.
        # Round-2 measured the NER chain collapse (32-core run at 10%
        # CPU); round 6 RE-TESTED enablement after the explicit
        # numbered repartitions (exempt from coalescing) took over the
        # entry points: kg_e2e improved (8.1 -> 6.8s at sf1.0 volume —
        # the post-NER linking/relations exchanges coalesce nicely),
        # but the minhash-LSH verify phase regressed 2.2 -> 4.0s warm
        # at the same volume (array_intersect per candidate pair
        # serialized behind a ~4MB pair exchange), and explicit-width
        # pinning of the bucket/verify exchanges did not reliably
        # recover it under measurement noise. Net across the bench:
        # wash-to-negative — kept OFF (OPTIMIZATION_r06.md, O18).
        # Skew-join splitting stays on.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def ensure_min_parallelism(df, min_partitions: int | None = None):
    """Repartition a DataFrame ONLY if its scan is under-split.

    The dedup/similarity operators start with compute-dense per-row
    expression chains (shingling, signatures, quantized cosines) whose
    CPU cost per byte is orders of magnitude above a typical SQL scan —
    the same imbalance that motivates the NER pipeline's explicit
    repartition. A small parquet input (one 128MB split) would run
    those chains single-threaded on a 32-core session. At 100 TB the
    scan has plenty of splits and this is a NO-OP — no extra shuffle
    is ever added to a well-split input.
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df
