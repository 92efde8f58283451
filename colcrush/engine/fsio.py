"""Scheme-aware filesystem I/O for dataset metadata.

The chunk/manifest parquet files already go through Spark's Hadoop-FS
layer (any scheme Spark supports: file://, hdfs://, s3a://, ...), but
the engine's own metadata — schema.json, the _compacted.json record,
flush markers, epoch-dir listings — used plain ``os``/``open`` and was
therefore silently LOCAL-ONLY. This module routes those operations
through the JVM's Hadoop FileSystem whenever the path carries a scheme
(parquet4s's Path is a Hadoop path end to end — IOOps.scala works
against any FileSystem, incl. the s3Test integration suite
/root/reference/s3Test/src/it/.../S3ItSpec.scala), while bare local
paths keep the cheap ``os`` fast path. Two schemes are exercised in
tests/test_remote_fs_paths.py: ``file://`` and ``viewfs://`` (Hadoop's
client-side mount-table FileSystem — distinct authority handling,
mount resolution and a checksummed delegate path); s3a jars are not in
this sandbox, but the Hadoop FS API surface used here is identical for
object-store schemes.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession


def has_scheme(path: str) -> bool:
    return "://" in path or path.startswith("file:")


def join(path: str, *parts: str) -> str:
    if has_scheme(path):
        return "/".join([path.rstrip("/")] + [p.strip("/") for p in parts])
    return os.path.join(path, *parts)


def _fs(path: str):
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"a scheme path ({path!r}) needs an active SparkSession "
            "(Hadoop FileSystem access goes through the JVM)"
        )
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, p


def exists(path: str) -> bool:
    if not has_scheme(path):
        return os.path.exists(path)
    _, fs, p = _fs(path)
    return bool(fs.exists(p))


def isdir(path: str) -> bool:
    if not has_scheme(path):
        return os.path.isdir(path)
    _, fs, p = _fs(path)
    return bool(fs.exists(p) and fs.isDirectory(p))


def listdir(path: str) -> list[str]:
    if not has_scheme(path):
        return os.listdir(path)
    _, fs, p = _fs(path)
    return [st.getPath().getName() for st in fs.listStatus(p)]


def makedirs(path: str) -> None:
    if not has_scheme(path):
        os.makedirs(path, exist_ok=True)
        return
    _, fs, p = _fs(path)
    fs.mkdirs(p)


def rmtree(path: str) -> None:
    if not has_scheme(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    _, fs, p = _fs(path)
    fs.delete(p, True)


def read_text(path: str) -> str:
    if not has_scheme(path):
        with open(path) as f:
            return f.read()
    jvm, fs, p = _fs(path)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def write_text(path: str, content: str) -> None:
    """Create/overwrite a small metadata file."""
    if not has_scheme(path):
        with open(path, "w") as f:
            f.write(content)
        return
    _, fs, p = _fs(path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def write_text_atomic(path: str, content: str) -> None:
    """Write via a temp sibling + rename — atomic on POSIX and HDFS;
    object stores degrade to copy semantics, acceptable for a small
    marker file. Hadoop's FileSystem.rename reports failure by
    RETURNING false (no exception), so both steps are checked: a
    silently-lost commit record would leave the dataset in a state a
    later crash cannot recover from."""
    tmp = path + ".tmp"
    write_text(tmp, content)
    if not has_scheme(path):
        os.replace(tmp, path)
        return
    _, fs, p = _fs(path)
    _, _, tp = _fs(tmp)
    if fs.exists(p) and not fs.delete(p, False):
        raise IOError(f"could not replace existing {path}")
    if not fs.rename(tp, p):
        raise IOError(f"rename {tmp} -> {path} failed")


def read_json(path: str):
    return json.loads(read_text(path))
