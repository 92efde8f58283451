"""Scheme-path (Hadoop FileSystem) support for dataset metadata.

parquet4s runs against any Hadoop FileSystem (its Path is a Hadoop
path end to end; the reference ships an S3 integration suite,
s3Test/src/it/.../S3ItSpec.scala). colcrush's chunk/manifest parquet
always went through Spark's Hadoop layer, but the engine's own
metadata I/O (schema.json, compaction record, epoch listings, flush
markers) was os/open-based and silently local-only. These tests drive
the FULL engine lifecycle through ``file://`` URIs — the only scheme
mountable in this sandbox; the fsio layer uses the identical Hadoop
FileSystem API surface (exists/listStatus/open/create/rename/delete)
that s3a:// or hdfs:// paths would hit.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from colcrush.engine import (
    compact_epochs,
    read_decoded,
    read_manifest,
    resume_encode,
    write_encoded,
)
from colcrush.engine.scan import column_min_max, count_rows, scan
from colcrush.fixtures import source_code_df


def test_engine_lifecycle_over_scheme_paths(spark, tmp_path):
    uri = f"file://{tmp_path}/ds"
    df = source_code_df(spark, 300, n_repos=4)
    write_encoded(df, uri, mode="overwrite", group_cols=["lang"])

    # metadata files landed through the Hadoop FS layer
    assert os.path.exists(tmp_path / "ds" / "schema.json")

    back = read_decoded(spark, uri)
    assert back.count() == 300
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0

    # stats + filtered scan over the scheme path
    assert count_rows(spark, uri) == 300
    mn, mx = column_min_max(spark, uri, "lang")
    assert mn is not None and mx is not None and mn <= mx
    got = scan(spark, uri, columns=["repo"], filters=[("lang", "==", mn)])
    assert got.count() > 0

    # CREATE-mode refusal sees the existing dataset through the scheme
    with pytest.raises(FileExistsError):
        write_encoded(df, uri, mode="error", group_cols=["lang"])

    # resume over the scheme path: everything committed -> 0 units
    assert resume_encode(df, uri, group_cols=["lang"]) == 0


def test_epochs_and_compaction_over_scheme_paths(spark, tmp_path):
    uri = f"file://{tmp_path}/sds"
    df = source_code_df(spark, 200, n_repos=3)
    half_a = df.where(F.col("lang") < "m")
    half_b = df.where(F.col("lang") >= "m")
    write_encoded(half_a, f"{uri}/epoch=00000000", mode="overwrite",
                  group_cols=["lang"], namespace="epoch-0")
    write_encoded(half_b, f"{uri}/epoch=00000001", mode="overwrite",
                  group_cols=["lang"], namespace="epoch-1")
    assert read_decoded(spark, uri).count() == 200  # epoch view via listings

    assert compact_epochs(spark, uri) == 2
    assert read_decoded(spark, uri).count() == 200
    assert not [d for d in os.listdir(tmp_path / "sds")
                if d.startswith("epoch=")]
    # the compaction record was written through the FS layer
    assert os.path.exists(tmp_path / "sds" / "_compacted.json")
    m = read_manifest(spark, uri)
    assert m.where(F.col("column") == "content").agg(
        F.sum("n_rows")
    ).collect()[0][0] == 200


def test_flush_marker_over_scheme_paths(spark, tmp_path):
    from colcrush.streaming.sink import PostWriteState, last_flushed_epoch

    uri = f"file://{tmp_path}/out"
    state = PostWriteState(
        epoch_id=7, processed_record_count=42, last_processed_record=None,
        partitions=[], _path=uri,
    )
    marker = state.flush()
    assert state.flushed and marker.endswith("00000007")
    assert os.path.exists(tmp_path / "out" / "_flush" / "00000007")
    assert last_flushed_epoch(uri) == 7


def test_engine_lifecycle_over_viewfs(spark, tmp_path):
    """A SECOND Hadoop FileSystem implementation beyond file://:
    ViewFileSystem (hadoop-common's client-side mount table, the
    federation scheme) resolves ``viewfs://cluster/...`` through a
    mount table and delegates to ChecksumFileSystem — different Path
    authority handling, mount resolution, rename constraints and a
    checksummed data path. Driving the full engine lifecycle through
    it is the closest available analog of the reference's S3ItSpec
    (s3a jars are not in this sandbox; documented in COVERAGE.md):
    every fsio call and Spark parquet read/write must be
    scheme-correct, not just file:-tolerant."""
    conf = spark._jsc.hadoopConfiguration()
    conf.set(
        "fs.viewfs.mounttable.colcrushtest.link./data", f"file://{tmp_path}"
    )
    uri = "viewfs://colcrushtest/data/ds"
    df = source_code_df(spark, 300, n_repos=4)
    write_encoded(df, uri, mode="overwrite", group_cols=["lang"])

    # metadata + chunks landed through the mount (with checksum files)
    assert os.path.exists(tmp_path / "ds" / "schema.json")
    assert os.path.exists(tmp_path / "ds" / ".schema.json.crc")

    back = read_decoded(spark, uri)
    assert back.count() == 300
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0

    assert count_rows(spark, uri) == 300
    mn, mx = column_min_max(spark, uri, "lang")
    assert mn is not None and mn <= mx
    assert scan(
        spark, uri, columns=["repo"], filters=[("lang", "==", mn)]
    ).count() > 0

    with pytest.raises(FileExistsError):
        write_encoded(df, uri, mode="error", group_cols=["lang"])
    assert resume_encode(df, uri, group_cols=["lang"]) == 0
