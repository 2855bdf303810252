"""SparkSession factory tuned for the rollup engine.

Local mode is used for tests/bench; the same config block is what we would
pass to spark-submit on a real cluster (AQE on, skew-join on, Arrow on,
UTC session timezone so bucket boundaries are deterministic).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "numalogic_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    cores: parallelism for local mode (``local[cores]``); defaults to
        ``$SPARK_GRAFT_CPUS`` or ``*``.
    shuffle_partitions: defaults to max(cores, 8) — sized so a partition of
        the sf-scaled input fits comfortably in memory; on a real cluster
        this scales with executor count (AQE coalesces the excess).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(n, 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let the planner pick shuffled-hash over sort-merge when its size
        # conditions hold (guide §3.1): measured 1.2-1.8× on the engine's
        # equi-join paths (ccf pair grid, as-of, interval joins) with no
        # sort. Joins still fall back to sort-merge when the per-partition
        # build side is too large; override via extra_conf on memory-tight
        # executors (the build side must fit per partition).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize per-batch framing on the grouped
        # kernels (pack fill, window build, AE scoring: measured 5-20%);
        # Spark 4's maxBytesPerBatch (64 MB default) still bounds memory
        # for fat rows (token arrays, image blobs), so the record cap can
        # sit high without risking worker OOM on wide batches
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # token rows carry ~1k-element arrays: large columnar batches become
        # G1 "humongous" allocations (> half a heap region) and 32 allocating
        # threads then serialize in the GC — keep batches ~2 MB and raise the
        # region size so array buffers stay in normal regions
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:G1HeapRegionSize=32m -XX:+UseG1GC",
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
