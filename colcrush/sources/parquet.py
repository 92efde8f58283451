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
    (which funnels the whole table through one task): range-partition
    on the order key, count per partition (a tiny driver-side list),
    turn counts into cumulative offsets, then a partition-LOCAL
    row_number plus the offset. Partitions whose offset range can't
    intersect [lo, hi) are filtered out before the window runs, so at
    100 TB only the partitions containing the requested slice do work.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_part, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = sorted(
        part.groupBy("_pid").count().collect(), key=lambda r: r["_pid"]
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    keep = [
        r["_pid"]
        for r in counts
        if offsets[r["_pid"]] < hi and offsets[r["_pid"]] + r["count"] > lo
    ]
    if not keep:
        return df.where(F.lit(False))
    off_map = F.create_map(
        *[F.lit(x) for p in keep for x in (p, offsets[p])]
    )
    w = Window.partitionBy("_pid").orderBy(F.col(order_col))
    return (
        part.where(F.col("_pid").isin(keep))
        .withColumn("_ord", off_map[F.col("_pid")] + F.row_number().over(w) - 1)
        .where((F.col("_ord") >= lo) & (F.col("_ord") < hi))
        .drop("_ord", "_pid")
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
