"""Single-object parquet over an object store — S3ItSpec parity.

The reference's S3 integration test
(/root/reference/s3Test/src/it/scala/com/github/mjakubowski84/parquet4s/s3/S3ItSpec.scala:32-46)
writes a small typed dataset to ``s3a://bucket/file.parquet`` against a
LocalStack container and reads it back. This module is the colcrush
analog on the Python route: one parquet OBJECT (not a directory-of-
parts) written/read through ``pyarrow.fs.S3FileSystem``, driven in
tests against an in-process moto S3 server (real S3 HTTP protocol).

Scale note: a single-object write is inherently one task — this is the
small-table/metadata utility (exactly what S3ItSpec exercises), NOT
the bulk path. Bulk data goes through ``engine.write_encoded`` /
Spark's partitioned writers; on a real cluster those reach object
stores via the hadoop-aws connector (``s3a://``), which is not in this
sandbox (see engine/fsio.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..engine import fsio


def _resolve(url: str):
    """(pyarrow filesystem, path-within-fs) for s3:// or local urls."""
    if fsio._is_s3(url):
        return fsio._s3(url)
    from pyarrow import fs as pafs

    if fsio.has_scheme(url):
        return pafs.FileSystem.from_uri(url)
    return pafs.LocalFileSystem(), url


def write_parquet_object(df: DataFrame, url: str, mode: str = "error") -> None:
    """Write ``df`` as ONE parquet object at ``url`` (S3ItSpec's
    ParquetWriter.writeAndClose over s3). mode 'error'|'overwrite'
    mirrors the CREATE/OVERWRITE contract (IOOps.scala:37-56). The
    frame is materialized driver-side via Arrow — small tables only."""
    if mode not in ("error", "overwrite"):
        raise ValueError(f"mode must be 'error' or 'overwrite', got {mode!r}")
    if mode == "error" and fsio.exists(url):
        raise FileExistsError(url)
    import pyarrow.parquet as pq

    fs, key = _resolve(url)
    table = df.toArrow()
    pq.write_table(table, key, filesystem=fs)


def read_parquet_object(
    spark: SparkSession, url: str, columns: list[str] | None = None
) -> DataFrame:
    """Read one parquet object back into a DataFrame
    (ParquetReader.as[Data].read(path) in S3ItSpec:43-45); ``columns``
    is the projected-read analog — the column prune happens in the
    parquet reader, so only the requested columns cross the wire."""
    import pyarrow.parquet as pq

    fs, key = _resolve(url)
    table = pq.read_table(key, filesystem=fs, columns=columns)
    return spark.createDataFrame(table)
