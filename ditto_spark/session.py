"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same config block is what we'd pass to
spark-submit on a real cluster (AQE, skew-join handling, Arrow batching).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ditto_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    cores=None -> local[*]. shuffle_partitions defaults to the core count
    locally; on a real cluster you'd size it to ~2-3x total executor cores.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else 0
    master = f"local[{cores}]" if cores else "local[*]"

    # Pin BLAS to one thread per python worker. numpy's OpenBLAS spawns
    # its own threads inside every pandas-UDF worker, so a local[N] run
    # silently uses more than N cores — which both oversubscribes high-N
    # runs and (worse) INFLATES low-N legs of the scaling bench: at
    # local[2] two workers x 2 BLAS threads is a hidden 2x, corrupting
    # the N-vs-4N efficiency ratio. On a real cluster the same pinning
    # keeps spark.task.cpus=1 accounting honest. Set in os.environ too:
    # local-mode python workers inherit the driver JVM's environment.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if shuffle_partitions is None:
        shuffle_partitions = cores if cores else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # determinism + oracle comparability
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas-UDF boundary (the only Python hot path)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # adaptive execution: runtime re-plan, skew-join splitting,
        # partition coalescing — all required at the 100TB design point
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # broadcast small dims automatically; engine also hints explicitly
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode runs ALL executor threads in the driver JVM: size the
        # heap for 32 concurrent tasks + operator caches, or high-core
        # runs GC-thrash (measured: local[32] 4x SLOWER than local[8] at
        # 8g on a 300k-doc pipeline; the box has 128GiB)
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # throughput GC: G1's concurrent cycles collapse under 32 task
        # threads' allocation rate on this box (measured 2x slower than
        # ParallelGC on a string-shuffle benchmark: 66s vs 34s at
        # local[32]; identical at local[8]). Batch analytics wants
        # throughput GC; a large young gen absorbs shuffle-row churn.
        .config("spark.driver.extraJavaOptions",
                os.environ.get("SPARK_DRIVER_JAVA_OPTS",
                               "-XX:+UseParallelGC -XX:NewRatio=1"))
        .config("spark.ui.enabled", "false")
        # catalog-table surface (S1): managed tables land here when no
        # external metastore/warehouse is configured. Env-overridable;
        # a real deployment points this (or its Iceberg/Hive catalog
        # equivalents) at durable storage via spark-submit --conf.
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE_DIR",
                               "/tmp/ditto_spark_warehouse"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # cluster-mode equivalent of the BLAS pinning above (local mode
        # inherits os.environ; real executors need executorEnv)
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.executorEnv.NUMEXPR_NUM_THREADS", "1")
    )
    # shuffle/spill scratch: this sandbox's disk is shared-host and
    # becomes the bottleneck under high task concurrency (32 threads
    # measured SLOWER than 8 with on-disk shuffle); tmpfs removes it.
    # On a real cluster leave SPARK_LOCAL_DIRS to the NVMe-backed default.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()


def clear_operator_caches(spark: SparkSession) -> None:
    """Release the self-join caches blocking operators register
    (key_blocking / sorted_neighborhood / minhash buckets / global_rank
    cache their join inputs; Spark never auto-unpersists them). Call
    between independent pipeline runs in a long-lived session — the
    CheckpointStore does this automatically after each stage lands.
    Scoped: only operator-registered frames are unpersisted; caches the
    caller owns survive. This releases EVERY scope's registrations — the
    between-runs hammer; per-run cleanup happens automatically via
    ``cachereg.cache_scope`` inside pipeline stages."""
    from ditto_spark.cachereg import release_all
    from ditto_spark.operators.embed import clear_probe_cache

    release_all()
    clear_probe_cache()
