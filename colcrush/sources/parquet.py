"""parquet4s-style scan API parity on Spark sources.

Maps the reference's reader builders
(/root/reference/core/src/main/scala/com/github/mjakubowski84/parquet4s/ParquetReader.scala:82-333)
onto ``spark.read`` — Catalyst natively performs the partition
discovery/pruning, predicate pushdown and column pruning parquet4s
hand-rolls (SURVEY.md §4): nothing custom is needed, which is the
Spark-first point. The helpers exist so a parquet4s user finds the
same verbs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def read(spark: SparkSession, path: str) -> DataFrame:
    """Generic scan — ParquetReader.generic (ParquetReader.scala:278)."""
    return spark.read.parquet(path)


def read_projected(
    spark: SparkSession, path: str, schema_or_cols
) -> DataFrame:
    """Projected scan — ParquetReader.projectedAs / projectedGeneric
    (ParquetReader.scala:272-319). Accepts a StructType (enforced
    projection schema) or a list of column/alias specs; nested paths
    ('a.b') and aliases ('a.b as x') are supported like Col().alias."""
    if isinstance(schema_or_cols, T.StructType):
        return spark.read.schema(schema_or_cols).parquet(path)
    cols = []
    for spec in schema_or_cols:
        if isinstance(spec, tuple):
            path_expr, alias = spec
            cols.append(F.col(path_expr).alias(alias))
        else:
            cols.append(F.col(spec))
    return spark.read.parquet(path).select(*cols)


def read_filtered(spark: SparkSession, path: str, condition) -> DataFrame:
    """Filtered scan — builder .filter() (ParquetReader.scala:92);
    Catalyst pushes supported predicates to the parquet row groups
    (the reference's Filter -> FilterApi compilation, Filter.scala:186-247)."""
    df = spark.read.parquet(path)
    return df.where(condition)


def read_partitioned(spark: SparkSession, base_path: str) -> DataFrame:
    """Hive-partitioned directory scan with partition-value injection —
    listPartitionedDirectory + partition injection
    (/root/reference/core/src/main/scala/com/github/mjakubowski84/parquet4s/IOOps.scala:95-176,
    ParquetReader.scala:173-180). Spark discovers k=v directories and
    injects typed partition columns natively."""
    return spark.read.option("basePath", base_path).parquet(base_path)


def record_filter(df: DataFrame, lo: int, hi: int, order_col: str) -> DataFrame:
    """Row-ordinal filter — parquet4s RecordFilter (Filter.scala:15-53).

    The reference filters on the file-local row index; a distributed
    engine needs a total order, so the ordinal is defined by
    ``order_col``. offset/limit semantics: keep ordinals in [lo, hi).

    Two-pass distributed ordinal, NOT a global unpartitioned window
    over the table (which funnels every row through one task):
    range-partition on the order key, count per partition, turn the
    counts into cumulative offsets DISTRIBUTED-SIDE (a window over the
    counts DF — at most ``defaultParallelism`` rows, so the one-task
    stage it implies is O(partitions), never O(rows); nothing is
    collected to the driver, which matters at the ~3M-partition
    SCALE.md shape), then a partition-LOCAL row_number plus the
    broadcast-joined offset. Partitions whose offset range can't
    intersect [lo, hi) are pruned by the inner join before the table
    window runs, so at 100 TB only the partitions containing the
    requested slice do work.

    The range-partitioned table is MATERIALIZED once (lazy
    localCheckpoint, pinned by the counts pass) before the two
    branches read it: the counts branch and the final window branch
    otherwise plan two INDEPENDENT range exchanges (column pruning
    makes them non-identical, so no ReusedExchange), and each range
    exchange samples its boundaries with its own RDD-id-derived seed —
    once partitions outgrow the sampler's per-partition sample size
    the two evaluations can assign DIFFERENT _pids, silently
    corrupting ordinals. Materializing fixes the _pid assignment (and
    saves the second scan + range shuffle as a side effect). The
    pinned copy is partition-block storage on the executors —
    memory-then-disk, the standard cost of any consistent two-pass
    algorithm over a shuffled intermediate.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_part, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # window input is the counts DF (<= n_part rows): partitioning on a
    # constant routes those few rows through one task, which is the
    # intended O(partitions) sequential scan of the offsets. The
    # constant is spelled _pid % 1 because Catalyst folds a bare
    # literal into an EMPTY partition spec (a true global window).
    w_off = (
        Window.partitionBy(F.col("_pid") % F.lit(1))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        counts.withColumn(
            "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
        )
        .where((F.col("_off") < hi) & (F.col("_off") + F.col("_cnt") > lo))
        .select("_pid", "_off")
    )
    w = Window.partitionBy("_pid").orderBy(F.col(order_col))
    return (
        part.join(F.broadcast(offsets), "_pid", "inner")
        .withColumn("_ord", F.col("_off") + F.row_number().over(w) - 1)
        .where((F.col("_ord") >= lo) & (F.col("_ord") < hi))
        .drop("_ord", "_off", "_pid")
    )


def write(df: DataFrame, path: str, mode: str = "error", **options) -> None:
    """Typed writer parity — ParquetWriter.writeAndClose
    (ParquetWriter.scala:242); mode CREATE='error' / OVERWRITE
    (IOOps.scala:37-56)."""
    df.write.mode(mode).options(**options).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
    default_partition: str | None = None,
    mode: str = "error",
) -> None:
    """Hive-partitioned write — the batch analog of the rotating sink
    (ParquetPartitioningFlow.scala:363-404): partitionBy builds k=v
    dirs, maxRecordsPerFile is the rotation-by-count cap (:503-507),
    defaultPartition maps nulls (:344-349)."""
    if default_partition is not None:
        for c in partition_cols:
            df = df.withColumn(c, F.coalesce(F.col(c), F.lit(default_partition)))
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).parquet(path)


def read_custom(spark: SparkSession, fmt: str, path: str | None = None, **options) -> DataFrame:
    """Custom reader passthrough — ParquetReader.custom[T](builder)
    parity (ParquetReader.scala:328-333): any DataSource V2 format with
    arbitrary options flows through Spark's reader builder."""
    reader = spark.read.format(fmt).options(**options)
    return reader.load(path) if path else reader.load()


def write_single_file(df: DataFrame, path: str, mode: str = "error") -> None:
    """Single-file sink — akka/fs2 SingleFileParquetSink parity
    (/root/reference/akkaPekko/src/main/scala/com/github/mjakubowski84/parquet4s/SingleFileParquetSink.scala:109-138):
    coalesce(1) serializes the write into one part-file. Scale note:
    this is inherently single-task by definition — use partitioned
    writes for anything big."""
    df.coalesce(1).write.mode(mode).parquet(path)


def write_with_timestamp_format(
    df: DataFrame, path: str, fmt: str = "INT96", mode: str = "error"
) -> None:
    """Timestamp encoding variants — parquet4s TimestampFormat parity
    (/root/reference/core/src/main/scala/com/github/mjakubowski84/parquet4s/TimestampFormat.scala:15-18;
    INT96 default per Schema.scala:286-307, INT64 millis/micros via
    implicits). Spark exposes the same switch as
    spark.sql.parquet.outputTimestampType: INT96 | TIMESTAMP_MICROS |
    TIMESTAMP_MILLIS."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", "INT96")
    spark.conf.set("spark.sql.parquet.outputTimestampType", fmt)
    try:
        df.write.mode(mode).parquet(path)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)


def read_merged(spark: SparkSession, *paths: str) -> DataFrame:
    """Multi-file scan with schema union — parquet4s's merged projection
    schemas (Schema.scala:34-52): Spark's mergeSchema unions fields
    across files, nulling the ones a file lacks."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
