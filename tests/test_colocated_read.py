"""Shuffle-free colocated read path (engine/dataset.py r8).

read_decoded(colocated=True) fuses a whole-file pyarrow chunk reader
with the decode worker in ONE mapInArrow stage: the chunk_id exchange
(which moves every encoded payload byte — ~10 TB per full read at
100 TB) disappears, and payload bytes never cross a process boundary.
These tests pin value equality with the default path, the shuffle-free
plan, legacy-file NULL-checksum tolerance, corruption detection, and
that compaction preserves the whole-chunks-per-file precondition.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import pyspark.sql.functions as F

from colcrush.engine import (
    compact_epochs,
    decode_table,
    read_chunks_colocated,
    read_decoded,
    write_encoded,
)
from colcrush.engine.dataset import CHUNKS_DIR, read_schema
from colcrush.fixtures import source_code_df


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _drop_stale_crc_siblings(chunks_dir):
    """Rewriting a part file with pyarrow invalidates the Hadoop local
    FS .crc sidecar Spark wrote; drop them so the DEFAULT read path
    (used as the comparison oracle) doesn't fail on its own checksum."""
    for n in os.listdir(chunks_dir):
        if n.endswith(".crc"):
            os.remove(os.path.join(chunks_dir, n))


def test_colocated_matches_default_full_and_projected(spark, tmp_path):
    ds = str(tmp_path / "ds")
    write_encoded(
        source_code_df(spark, 400, n_repos=6), ds,
        mode="overwrite", group_cols=["repo", "lang"],
    )
    # an append adds part files; per-file chunk completeness must hold
    # across revisions of the same dataset
    write_encoded(
        source_code_df(spark, 200, n_repos=6).withColumn(
            "commit", F.concat(F.lit("b"), "commit")
        ),
        ds, mode="append", group_cols=["repo", "lang"],
    )
    assert _rows(read_decoded(spark, ds, colocated=True)) == _rows(
        read_decoded(spark, ds)
    )
    assert _rows(
        read_decoded(spark, ds, columns=["path", "lang"], colocated=True)
    ) == _rows(read_decoded(spark, ds, columns=["path", "lang"]))


def test_colocated_plan_has_no_payload_exchange(spark, tmp_path):
    ds = str(tmp_path / "ds")
    # explicit num_partitions: the r9 bytes-justified default would
    # right-size this tiny input to ONE part file, collapsing the bin
    # exchange to SinglePartition — this test pins the MULTI-file plan
    # shape (range exchange on bin), so force a multi-file write
    write_encoded(
        source_code_df(spark, 200, n_repos=4), ds,
        mode="overwrite", group_cols=["lang"], num_partitions=4,
    )
    plan = (
        read_decoded(spark, ds, colocated=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    # exactly one exchange: the file-list bin repartition (path strings,
    # not payloads); the chunk_id exchange of the default path is gone
    assert len(exchanges) == 1, exchanges
    assert "bin" in exchanges[0]
    default_plan = (
        read_decoded(spark, ds)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning(chunk_id" in default_plan


def test_colocated_reads_legacy_file_without_payload_ck(spark, tmp_path):
    """A pre-r6 part file has no payload_ck column; the colocated
    reader must surface NULL checksums (per-row skip), matching the
    explicit-schema Spark read."""
    ds = str(tmp_path / "ds")
    write_encoded(
        source_code_df(spark, 150, n_repos=3), ds,
        mode="overwrite", group_cols=["lang"],
    )
    chunks_dir = os.path.join(ds, CHUNKS_DIR)
    for name in os.listdir(chunks_dir):
        if not name.endswith(".parquet"):
            continue
        f = os.path.join(chunks_dir, name)
        tbl = pq.read_table(f)
        if "payload_ck" in tbl.column_names:
            pq.write_table(tbl.drop_columns(["payload_ck"]), f)
    _drop_stale_crc_siblings(chunks_dir)
    got = read_decoded(spark, ds, colocated=True)
    assert _rows(got) == _rows(read_decoded(spark, ds))


def test_colocated_detects_payload_corruption(spark, tmp_path):
    """Bit rot on a part file must still fail loudly through the fused
    path (decode-time checksum verify is not bypassed by the reader)."""
    ds = str(tmp_path / "ds")
    write_encoded(
        source_code_df(spark, 150, n_repos=3), ds,
        mode="overwrite", group_cols=["lang"],
    )
    chunks_dir = os.path.join(ds, CHUNKS_DIR)
    victim = sorted(
        n for n in os.listdir(chunks_dir) if n.endswith(".parquet")
    )[0]
    f = os.path.join(chunks_dir, victim)
    tbl = pq.read_table(f)
    payloads = tbl.column("payload").to_pylist()
    payloads[0] = bytes([payloads[0][0] ^ 0xFF]) + payloads[0][1:]
    arrays = [
        pa.array(payloads, type=pa.binary())
        if name == "payload"
        else tbl.column(name)
        for name in tbl.column_names
    ]
    pq.write_table(
        pa.table(arrays, names=tbl.column_names), f
    )
    _drop_stale_crc_siblings(chunks_dir)
    with pytest.raises(Exception, match="integrity"):
        read_decoded(spark, ds, colocated=True).count()


def test_colocated_across_epochs_and_compaction(spark, tmp_path):
    """Epoch-view datasets read colocated; compaction (which now
    repartitions on chunk_id before its rewrite) preserves the
    whole-chunks-per-file precondition, so the colocated read keeps
    working on the compacted base layout."""
    ds = str(tmp_path / "ds")
    df = source_code_df(spark, 300, n_repos=4)
    write_encoded(
        df.where(F.col("lang") < "m"), os.path.join(ds, "epoch=00000000"),
        mode="overwrite", group_cols=["lang"], namespace="epoch-0",
    )
    write_encoded(
        df.where(F.col("lang") >= "m"), os.path.join(ds, "epoch=00000001"),
        mode="overwrite", group_cols=["lang"], namespace="epoch-1",
    )
    before = _rows(read_decoded(spark, ds, colocated=True))
    assert len(before) == 300
    assert compact_epochs(spark, ds) == 2
    assert _rows(read_decoded(spark, ds, colocated=True)) == before
    # compaction rebuilt the chunk->file sidecar against the base
    # layout, so the file-pruned scan works on the compacted dataset
    from colcrush.engine import scan
    from colcrush.engine.dataset import _committed_part_files, file_map_matches

    assert file_map_matches(ds, [r for r, _, _ in _committed_part_files(ds)])
    got = scan(
        spark, ds, columns=["path"], filters=[("lang", "==", "py")],
        colocated=True,
    )
    assert _rows(got) == _rows(
        scan(spark, ds, columns=["path"], filters=[("lang", "==", "py")])
    )


def test_file_map_sidecar_lifecycle(spark, tmp_path):
    """write_encoded maintains the chunk->file sidecar incrementally;
    ensure_file_map is idempotent and the completeness marker tracks
    the committed part-file set."""
    from colcrush.engine import ensure_file_map
    from colcrush.engine.dataset import (
        _committed_part_files,
        file_map_matches,
        read_file_map,
    )

    ds = str(tmp_path / "ds")
    write_encoded(
        source_code_df(spark, 300, n_repos=5), ds,
        mode="overwrite", group_cols=["lang"],
    )
    parts = _committed_part_files(ds)
    assert file_map_matches(ds, [r for r, _, _ in parts])
    assert ensure_file_map(spark, ds) == 0  # idempotent no-op
    # every part file is mapped, and every manifest chunk id appears
    mapped_files = {
        r["file"] for r in read_file_map(spark, ds).select("file").distinct().collect()
    }
    assert mapped_files == {r for r, _, _ in parts}
    # append maps only the delta
    write_encoded(
        source_code_df(spark, 150, n_repos=5).withColumn(
            "commit", F.concat(F.lit("y"), "commit")
        ),
        ds, mode="append", group_cols=["lang"],
    )
    parts2 = _committed_part_files(ds)
    assert len(parts2) > len(parts)
    assert file_map_matches(ds, [r for r, _, _ in parts2])


def test_colocated_scan_matches_default_and_prunes_files(spark, tmp_path):
    """File-pruned colocated scan: same rows as the default plan for a
    selective filter AND a single-row point lookup; no chunk_id
    exchange in the pruned plan."""
    from colcrush.engine import scan

    ds = str(tmp_path / "ds")
    src = source_code_df(spark, 500, n_repos=8)
    write_encoded(src, ds, mode="overwrite", group_cols=["repo", "lang"])
    row = src.first()
    group_f = [("repo", "==", row["repo"]), ("lang", "==", row["lang"])]
    point_f = [("path", "==", row["path"])]
    for filters in (group_f, point_f):
        a = _rows(scan(spark, ds, columns=["path", "content"], filters=filters))
        b_df = scan(
            spark, ds, columns=["path", "content"], filters=filters,
            colocated=True,
        )
        assert _rows(b_df) == a and len(a) > 0
        plan = b_df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(chunk_id" not in plan
    # a filter surviving nothing returns empty, both paths
    assert scan(
        spark, ds, filters=[("lang", "==", "no-such-lang")], colocated=True
    ).count() == 0


def test_colocated_scan_falls_back_safely(spark, tmp_path):
    """Stale/missing sidecar marker or an over-cap surviving-file set
    must fall back to the default plan, never return wrong rows."""
    from colcrush.engine import scan
    from colcrush.engine.dataset import FILE_MAP_DIR, _FILE_MAP_MARKER

    ds = str(tmp_path / "ds")
    src = source_code_df(spark, 300, n_repos=5)
    write_encoded(src, ds, mode="overwrite", group_cols=["lang"])
    row = src.first()
    filters = [("lang", "==", row["lang"])]
    want = _rows(scan(spark, ds, columns=["path"], filters=filters))
    # cap forces the fallback even with a healthy sidecar
    capped = scan(
        spark, ds, columns=["path"], filters=filters,
        colocated=True, max_pruned_files=0,
    )
    assert _rows(capped) == want
    assert "Exchange hashpartitioning(chunk_id" in (
        capped._jdf.queryExecution().executedPlan().toString()
    )
    # stale marker: fallback, still correct
    os.remove(os.path.join(ds, FILE_MAP_DIR, _FILE_MAP_MARKER))
    assert _rows(
        scan(spark, ds, columns=["path"], filters=filters, colocated=True)
    ) == want


def test_read_chunks_colocated_standalone(spark, tmp_path):
    """The unfused chunk DF keeps the decode_table contract
    (assume_colocated=True) — the documented fallback surface."""
    ds = str(tmp_path / "ds")
    write_encoded(
        source_code_df(spark, 200, n_repos=4), ds,
        mode="overwrite", group_cols=["lang"],
    )
    chunks = read_chunks_colocated(spark, ds)
    got = decode_table(chunks, read_schema(ds), assume_colocated=True)
    assert _rows(got) == _rows(read_decoded(spark, ds))


def test_write_encoded_file_map_optout(spark, tmp_path):
    """file_map=False (the streaming-epoch setting) must skip the
    sidecar build entirely — per-epoch maps have no reader — while the
    dataset itself stays fully readable and a later explicit
    ensure_file_map builds the map on demand."""
    import os

    from colcrush.engine import ensure_file_map
    from colcrush.engine.dataset import FILE_MAP_DIR, _committed_part_files, file_map_matches

    ds = str(tmp_path / "ds")
    write_encoded(
        source_code_df(spark, 200, n_repos=4), ds,
        mode="overwrite", group_cols=["lang"], file_map=False,
    )
    assert not os.path.exists(os.path.join(ds, FILE_MAP_DIR))
    assert read_decoded(spark, ds).count() == 200
    # on-demand build still works and covers the full part-file set
    assert ensure_file_map(spark, ds) > 0
    assert file_map_matches(ds, [r for r, _, _ in _committed_part_files(ds)])
