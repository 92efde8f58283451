"""SparkSession factory tuned for the colcrush engine.

Local mode here is a proxy for a multi-executor cluster: settings are
chosen so the same code scales (AQE on, shuffle partitions ~ cores,
Arrow batches sized for the codec layer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "colcrush",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
    extra: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(8, cores)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    # RAM-backed shuffle dirs when available: local-mode shuffles
    # otherwise serialize through one disk and cap scaling (on a real
    # cluster every executor brings its own shuffle disks)
    if os.path.isdir("/dev/shm"):
        shuffle_dir = "/dev/shm/colcrush-spark-local"
        os.makedirs(shuffle_dir, exist_ok=True)
        b = b.config("spark.local.dir", shuffle_dir)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
