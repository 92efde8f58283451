"""Encoded dataset persistence: chunks + manifest + resumable restarts.

Directory layout (an Iceberg-metadata-style commit protocol without the
Iceberg jars, which aren't in this image):

  <root>/schema.json          original table schema (Spark JSON)
  <root>/chunks/              chunk rows incl. payload, parquet, UNCOMPRESSED
                              (our codecs did the compression — storing
                              them re-compressed would hide the ratio)
  <root>/manifest/            chunk rows sans payload (lineage + metrics:
                              codec, dict size, ratio, row counts, min/max)
  <root>/salt_plan/           recorded skew plan (group -> bytes, n_salts):
                              resume/append re-encodes reuse it instead of
                              re-scanning the input for the size histogram

The manifest is written AFTER the chunks, so its presence commits them —
the analog of parquet4s's postWriteHandler checkpoint semantics
(/root/reference/akkaPekko/src/main/scala/com/github/mjakubowski84/parquet4s/ParquetPartitioningFlow.scala:303-316).
Resume = anti-join the planned (group, salt) work units against the
committed manifest and encode only what's missing
(SURVEY.md §7 step 5).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from . import fsio
from .decoder import decode_table
from .encoder import (
    ENCODED_DDL,
    MANIFEST_COLS,
    encode_table,
    group_key_expr,
    payload_ck,
    plan_salts,
)

SCHEMA_FILE = "schema.json"
CHUNKS_DIR = "chunks"
MANIFEST_DIR = "manifest"
SALT_PLAN_DIR = "salt_plan"


def _write_schema(path: str, schema: T.StructType) -> None:
    fsio.makedirs(path)
    fsio.write_text(fsio.join(path, SCHEMA_FILE), schema.json())


def read_schema(path: str) -> T.StructType:
    p = fsio.join(path, SCHEMA_FILE)
    if not fsio.exists(p):
        epochs = _committed_epoch_dirs(path)
        if epochs:
            p = fsio.join(epochs[0], SCHEMA_FILE)
    return T.StructType.fromJson(fsio.read_json(p))


def write_encoded(
    df: DataFrame,
    path: str,
    mode: str = "error",
    file_map: bool = True,
    **encode_kwargs,
) -> None:
    """Encode ``df`` and persist chunks + manifest at ``path``.

    mode: 'error' (CREATE semantics, like parquet4s Mode.CREATE —
    /root/reference/core/src/main/scala/com/github/mjakubowski84/parquet4s/IOOps.scala:37-56),
    'overwrite', or 'append'.

    ``file_map=False`` skips the chunk->file sidecar build (a Spark job
    reading every new part file's chunk_id column). Streaming epoch
    sub-datasets pass False: per-epoch sidecars have NO reader —
    root-level scans need a root map, and compaction deletes epoch
    dirs and rebuilds the map anyway — so building one per micro-batch
    was pure per-epoch latency.
    """
    if mode not in ("error", "overwrite", "append"):
        # an unrecognized mode must fail loudly: it would otherwise
        # skip the CREATE existence check and silently APPEND
        raise ValueError(f"mode must be error|overwrite|append, got {mode!r}")
    chunks_path = fsio.join(path, CHUNKS_DIR)
    manifest_path = fsio.join(path, MANIFEST_DIR)
    if mode == "error" and fsio.exists(chunks_path):
        raise FileExistsError(f"{path} already contains an encoded dataset")
    if mode == "append" and fsio.exists(fsio.join(path, SCHEMA_FILE)):
        existing = read_schema(path)
        if existing != df.schema:
            raise ValueError(
                f"append schema mismatch: dataset has {existing.simpleString()}, "
                f"got {df.schema.simpleString()}"
            )
    # salted-group writes compute the salt plan HERE (one histogram
    # pass) and persist it as a sidecar: resume/append re-encodes then
    # reuse the recorded plan instead of paying a second full input
    # scan, and the recorded salts make re-encode chunk identity a
    # stored fact rather than a recomputation
    group_cols = list(encode_kwargs.get("group_cols") or [])
    plan = encode_kwargs.get("salt_plan")
    own_plan = (
        plan is None and bool(group_cols) and encode_kwargs.get("salted", True)
    )
    if own_plan:
        plan, _total = plan_salts(
            df,
            group_cols,
            encode_kwargs.get("target_group_bytes", 16 << 20),
            with_total=True,
        )
        encode_kwargs["salt_plan"] = plan
    encoded = None
    try:
        # encode_table sits inside the try: if it raises (unknown bloom
        # column, unsortable group cols, ...) the persisted salt-plan
        # histogram must still be released
        encoded = encode_table(df, **encode_kwargs).persist()
        _write_schema(path, df.schema)
        write_mode = "overwrite" if mode == "overwrite" else "append"
        if plan is not None:
            # the plan sidecar lands BEFORE the chunks: a write that
            # crashes mid-chunk-job leaves the recorded plan behind, so
            # the resume re-encode skips the histogram pass and
            # reproduces the originally planned chunking exactly
            plan.write.mode(write_mode).parquet(fsio.join(path, SALT_PLAN_DIR))
        (
            encoded.write.mode(write_mode)
            .option("compression", "uncompressed")
            .parquet(chunks_path)
        )
        # manifest rows come from the SAME persisted plan (encode runs
        # once; no chunk re-scan) and commit strictly after the chunks —
        # in append mode only the new rows are appended, so the manifest
        # write cost stays proportional to the increment at 100 TB
        manifest = encoded.select(*MANIFEST_COLS)
        manifest.write.mode(write_mode).parquet(manifest_path)
        # chunk->file sidecar AFTER the commit (incremental: maps only
        # the files this write added; overwrite invalidates the old map
        # first — its rows reference replaced files). A crash before
        # this point just leaves the marker stale and scans fall back.
        if write_mode == "overwrite":
            fsio.rmtree(fsio.join(path, FILE_MAP_DIR))
        if file_map:
            ensure_file_map(df.sparkSession, path)
    finally:
        if encoded is not None:
            encoded.unpersist()
        if own_plan:
            plan.unpersist()


def _committed_epoch_dirs(path: str) -> list[str]:
    """Epoch sub-datasets (streaming sink layout) whose manifest is
    committed — an epoch dir with chunks but no manifest/_SUCCESS is an
    uncommitted partial write and must stay invisible to readers."""
    if not fsio.isdir(path):
        return []
    out = []
    for d in sorted(fsio.listdir(path)):
        if d.startswith("epoch=") and fsio.exists(
            fsio.join(path, d, MANIFEST_DIR, "_SUCCESS")
        ):
            out.append(fsio.join(path, d))
    return out


def _direct_committed(path: str) -> bool:
    """The base-layout dataset at ``path`` is committed iff its
    manifest carries Spark's job-commit marker — a crashed compaction
    or write leaves chunks without a committed manifest, and readers
    must then keep seeing the epoch sub-datasets instead."""
    return fsio.exists(fsio.join(path, MANIFEST_DIR, "_SUCCESS"))


# Explicit read schemas: a dataset appended to across format revisions
# holds parquet files with and without the r6 payload_ck column, and
# plain spark.read.parquet infers the schema from ONE arbitrary footer
# — checksums would nondeterministically vanish (and compact_epochs
# would then drop them permanently). Reading with the declared schema
# fills absent columns with NULL deterministically, and unlike
# mergeSchema costs zero footer reads — which matters when chunks/ is
# millions of files at 100 TB.
_MANIFEST_DDL = ", ".join(
    f for f in ENCODED_DDL.split(", ") if not f.startswith("payload ")
)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    direct = fsio.join(path, MANIFEST_DIR)
    reader = spark.read.schema(_MANIFEST_DDL)
    if _direct_committed(path):
        return reader.parquet(direct)
    epochs = _committed_epoch_dirs(path)
    if epochs:
        return reader.parquet(*[fsio.join(e, MANIFEST_DIR) for e in epochs])
    return reader.parquet(direct)  # raise Spark's own path error


def read_chunks(spark: SparkSession, path: str) -> DataFrame:
    direct = fsio.join(path, CHUNKS_DIR)
    reader = spark.read.schema(ENCODED_DDL)
    if _direct_committed(path):
        return reader.parquet(direct)
    epochs = _committed_epoch_dirs(path)
    if epochs:
        return reader.parquet(*[fsio.join(e, CHUNKS_DIR) for e in epochs])
    return reader.parquet(direct)


def _committed_chunk_dirs(path: str) -> list[str]:
    """The chunks/ directories a reader sees (same commit-view rules as
    read_chunks: direct layout wins, else committed epochs)."""
    if _direct_committed(path):
        return [fsio.join(path, CHUNKS_DIR)]
    epochs = _committed_epoch_dirs(path)
    if epochs:
        return [fsio.join(e, CHUNKS_DIR) for e in epochs]
    return [fsio.join(path, CHUNKS_DIR)]


# the four chunk-row fields decode needs; the colocated reader emits
# exactly these so unrequested parquet columns are never read
COLOCATED_DDL = "chunk_id string, column string, payload binary, payload_ck bigint"


def _committed_part_files(path: str) -> list[tuple[str, str, int]]:
    """(relative, full, size) of every committed chunk part file.
    Relative paths (vs the dataset root) are what the file_map sidecar
    stores, so a dataset can be relocated without invalidating it."""
    root = path.rstrip("/")
    out = []
    for d in _committed_chunk_dirs(path):
        for name, size in fsio.list_files(d):
            if name.endswith(".parquet"):
                full = fsio.join(d, name)
                out.append((full[len(root) + 1 :], full, size))
    return out


def _file_set_fingerprint(rels: "list[str]") -> dict:
    """Order-independent fingerprint of a part-file name set: xor of
    md5 prefixes + count. O(1) driver memory beyond the listing the
    caller already holds."""
    import hashlib

    acc = 0
    for r in rels:
        acc ^= int(hashlib.md5(r.encode()).hexdigest()[:16], 16)
    return {"n_files": len(rels), "xor_md5": acc}


FILE_MAP_DIR = "file_map"
_FILE_MAP_MARKER = "_complete.json"
_FILE_MAP_DDL = "file string, chunk_id string"


def ensure_file_map(spark: SparkSession, path: str) -> int:
    """Bring the chunk->file sidecar up to date; returns the number of
    newly mapped part files.

    The sidecar is one row per (part file, chunk_id) — built by reading
    ONLY each new file's chunk_id column (a metadata-scale columnar
    read, no payload pages). It is what lets a selective scan open
    ONLY the files containing surviving chunks instead of scanning the
    whole chunks table: at the 100 TB / ~3M-file shape a bloom point
    lookup goes from touching every file's chunk rows to opening a
    handful of files. Idempotent and incremental (anti-join against
    the existing map — append cost is proportional to new files, the
    same property the manifest append has); the _complete.json marker
    stores a fingerprint of the COMMITTED file set, and readers use
    the map only when their own listing matches it, so a missing or
    stale sidecar degrades to the default scan, never to wrong rows.
    Same fall-back discipline as the salt_plan sidecar (r5)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not fsio.pyarrow_openable(path):
        # JVM-only scheme (hdfs://, viewfs://): the map-building worker
        # has no pyarrow handle for these, and neither would the
        # file-pruned scan that consumes the map — no-op, scans fall
        # back to the default plan (no marker is ever written)
        return 0
    files = _committed_part_files(path)
    fm_dir = fsio.join(path, FILE_MAP_DIR)
    fdf = spark.createDataFrame(
        [(r, f) for r, f, _ in files] or [("", "")],
        "file string, full string",
    ).where(F.col("file") != "")
    if fsio.exists(fsio.join(fm_dir, "_SUCCESS")):
        existing = spark.read.schema(_FILE_MAP_DDL).parquet(fm_dir)
        delta = fdf.join(
            existing.select("file").distinct(), on="file", how="left_anti"
        )
    else:
        delta = fdf
    n_delta = delta.count()
    if n_delta:
        def fn(it):
            pa.set_cpu_count(1)
            for batch in it:
                rels = batch.column("file").to_pylist()
                fulls = batch.column("full").to_pylist()
                for rel, full in zip(rels, fulls):
                    # close each file as soon as its ids are read — a
                    # task mapping many s3:// files would otherwise
                    # hold every NativeFile's buffers until GC. NOTE
                    # close(force=True): fsio.open_input_file returns a
                    # plain path for local files (ParquetFile owns the
                    # handle) but a NativeFile for s3://, and
                    # ParquetFile.close() skips externally-opened
                    # sources unless forced (verified on pyarrow 16).
                    pf = pq.ParquetFile(fsio.open_input_file(full))
                    try:
                        ids: set = set()
                        for rb in pf.iter_batches(
                            columns=["chunk_id"], batch_size=8192
                        ):
                            ids.update(rb.column("chunk_id").to_pylist())
                    finally:
                        pf.close(force=True)
                    ids = sorted(ids)
                    yield pa.record_batch(
                        [
                            pa.array([rel] * len(ids), type=pa.string()),
                            pa.array(ids, type=pa.string()),
                        ],
                        names=["file", "chunk_id"],
                    )

        n_part = min(
            max(1, n_delta), spark.sparkContext.defaultParallelism
        )
        (
            delta.repartition(n_part)
            .mapInArrow(fn, _FILE_MAP_DDL)
            .write.mode("append")
            .parquet(fm_dir)
        )
    # marker written AFTER the rows: a crash in between leaves a stale
    # fingerprint and readers fall back (never a map missing entries
    # that the marker claims complete)
    fsio.write_text_atomic(
        fsio.join(fm_dir, _FILE_MAP_MARKER),
        json.dumps(_file_set_fingerprint([r for r, _, _ in files])),
    )
    return int(n_delta)


def file_map_matches(path: str, rels: "list[str]") -> bool:
    """True iff the sidecar's completeness marker covers exactly this
    part-file set (readers pass the listing they already made)."""
    marker = fsio.join(path, FILE_MAP_DIR, _FILE_MAP_MARKER)
    if not fsio.exists(marker):
        return False
    try:
        return fsio.read_json(marker) == _file_set_fingerprint(rels)
    except (OSError, ValueError):
        return False


def read_file_map(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(_FILE_MAP_DDL).parquet(
        fsio.join(path, FILE_MAP_DIR)
    )


def _colocated_file_df(
    spark: SparkSession,
    path: str,
    files: "list[tuple[str, int]] | None" = None,
) -> "DataFrame | None":
    """One row per committed chunk part file, greedy size-binned into
    min(n_files, defaultParallelism) bins. 1x parallelism, not an
    oversubscribed multiple: a python-stage TASK costs ~0.2 CPU-s of
    worker/arrow-stream setup (measured interleaved: 32 bins cost
    +4.8 CPU-s over 8 bins for identical work at bench scale), which is
    also why AQE's parallelismFirst coalesces the default read path to
    ~defaultParallelism tasks — matching it keeps the colocated plan
    at CPU parity. Greedy largest-first size-binning bounds bin skew by
    the largest single file (a file is never split). None when the
    dataset has no part files. The file list is driver-side, same as
    Spark's own file-source listing. ``files`` overrides the listing
    with an explicit (full_path, size) subset — the file-pruned scan
    path passes only the files containing surviving chunks."""
    import heapq

    if files is None:
        files = [(f, s) for _, f, s in _committed_part_files(path)]
    if not files:
        return None
    n_bins = min(len(files), spark.sparkContext.defaultParallelism)
    # largest-first into the least-loaded bin via a heap — O(n log b),
    # driver-tractable at the ~3M-file target; (load, bin) ordering +
    # file-path tiebreak keep the assignment deterministic
    heap = [(0, b) for b in range(n_bins)]
    binned: list[tuple[int, str]] = []
    for f, size in sorted(files, key=lambda t: (-t[1], t[0])):
        load, b = heapq.heappop(heap)
        heapq.heappush(heap, (load + size, b))
        binned.append((b, f))
    # range-partition on bin: hash partitioning collides bin keys (e.g.
    # murmur3 sends 8 keys into 5 of 8 partitions), stacking several
    # size-balanced bins in one task and idling others — range gives
    # one bin per task, which is the whole point of the balancing
    return spark.createDataFrame(
        binned, "bin int, file string"
    ).repartitionByRange(n_bins, "bin")


def _chunk_file_batches(files, requested: "list[str] | None"):
    """Yield normalized chunk-row batches (chunk_id, column, payload,
    payload_ck) from whole chunk part files — pyarrow-read inside the
    worker. Mirrors the explicit-schema Spark read: absent payload_ck
    (pre-r6 files) reads as NULLs, unknown columns are never read.
    ``requested`` (original-table column names) prunes rows before any
    payload leaves the reader; batch_size is row-bounded low because a
    single chunk-column payload can be MBs."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    want_set = pa.array(requested, type=pa.string()) if requested else None
    target = pa.schema(
        [
            ("chunk_id", pa.string()),
            ("column", pa.string()),
            ("payload", pa.binary()),
            ("payload_ck", pa.int64()),
        ]
    )
    for f in files:
        # close each file after its batches are consumed: a long
        # fused-decode task iterating many part files must not hold
        # all handles/buffers until GC. close(force=True) because
        # fsio.open_input_file returns a plain path for local files
        # but a NativeFile for s3://, and ParquetFile.close() skips
        # externally-opened sources unless forced (pyarrow 16).
        pf = pq.ParquetFile(fsio.open_input_file(f))
        try:
            present = set(pf.schema_arrow.names)
            cols = [c for c in target.names if c in present]
            # 64 rows/batch bounds worker memory: a chunk-COLUMN payload
            # can approach target_chunk_bytes (8 MB default), so 64 rows
            # caps a batch at ~512 MB worst-case and ~1 MB at typical
            # ratios
            for rb in pf.iter_batches(columns=cols, batch_size=64):
                if want_set is not None:
                    rb = rb.filter(
                        pc.is_in(rb.column("column"), value_set=want_set)
                    )
                if rb.num_rows == 0:
                    continue
                arrays = []
                for field in target:
                    if field.name in present:
                        arrays.append(rb.column(field.name).cast(field.type))
                    else:
                        arrays.append(pa.nulls(rb.num_rows, field.type))
                yield pa.record_batch(arrays, schema=target)
        finally:
            pf.close(force=True)


def read_chunks_colocated(
    spark: SparkSession, path: str, columns: "list[str] | None" = None
) -> DataFrame:
    """Chunk rows for decode with per-task chunk COMPLETENESS, so
    ``decode_table(..., assume_colocated=True)`` can skip the
    chunk_id repartition — at 100 TB that exchange moves the entire
    encoded payload (~10 TB for a full read at our ratios).

    Why whole files are safe: every encoder task writes each chunk's
    rows contiguously into exactly one part file (output batches pack
    whole chunks; one file per task per write, maxRecordsPerFile
    unset), and compact_epochs repartitions on chunk_id before its
    rewrite — so every committed part file holds only whole chunks.
    Each task here pyarrow-reads whole files (never splits one), which
    preserves that completeness; the decoder still FAILS LOUDLY on an
    incomplete chunk (decoder.py), so a dataset compacted by a
    pre-r8 engine (whose rewrite could split a chunk across files)
    raises instead of mis-decoding — fall back to read_chunks there.

    NOTE: for an end-to-end decode prefer ``read_decoded(...,
    colocated=True)`` — it FUSES this reader with the decode worker in
    one mapInArrow stage, so payload bytes never cross a process
    boundary. Using this DataFrame with decode_table chains two Python
    stages and pays a python->JVM->python round trip of every payload
    (measured slower than the shuffle path at bench scale).

    Local and s3:// datasets only (pyarrow-openable from Python
    workers); JVM-only schemes raise in fsio.open_input_file.
    """
    fdf = _colocated_file_df(spark, path)
    if fdf is None:
        # preserve read_chunks' behavior on an empty/missing dataset
        return read_chunks(spark, path).select(
            "chunk_id", "column", "payload", "payload_ck"
        )
    requested = list(columns) if columns is not None else None

    def fn(it):
        import pyarrow as pa

        pa.set_cpu_count(1)
        for batch in it:
            yield from _chunk_file_batches(
                batch.column("file").to_pylist(), requested
            )

    return fdf.mapInArrow(fn, COLOCATED_DDL)


COMPACTED_FILE = "_compacted.json"


def _absorbed_epochs(path: str) -> list[str] | None:
    """Epoch dir basenames recorded as absorbed by a compaction, or
    None when no compaction record exists."""
    p = fsio.join(path, COMPACTED_FILE)
    if not fsio.exists(p):
        return None
    return fsio.read_json(p)["epochs"]


def compact_epochs(spark: SparkSession, path: str) -> int:
    """Compact a streaming-sink dataset (epoch=NNNNNNNN sub-datasets)
    into the base layout — a CHUNK-LEVEL move, never a re-encode: chunk
    payloads are already compressed and their ids are epoch-namespaced
    (no collisions), so compaction is one distributed copy of chunk
    rows plus the manifest. Returns the number of epochs compacted.

    Crash-safe ordering: base chunks first, then the _compacted.json
    record of which epoch dirs the base absorbs, then the base manifest
    (its _SUCCESS marker is what flips readers from the epoch view to
    the base view — see _direct_committed), epoch-dir cleanup last. A
    crash at any point leaves readers on exactly one consistent view;
    re-running compaction after a crash between the manifest commit and
    the cleanup deletes exactly the recorded absorbed dirs (returns 0).
    Epochs NOT in the record with a committed base present are an
    inconsistent state (a sink kept writing past compaction — the
    encode sink refuses to, see streaming/encode_sink.py) and raise.
    """
    epochs = _committed_epoch_dirs(path)
    if _direct_committed(path):
        # resume of the cleanup phase: delete only what the base absorbs
        absorbed = _absorbed_epochs(path)
        if absorbed is None and epochs:
            raise ValueError(
                f"{path} has a committed base dataset but no compaction "
                "record — cannot tell whether the remaining epoch dirs "
                "are absorbed (safe to delete) or contain unmerged data"
            )
        leftover = [e for e in epochs if os.path.basename(e) not in (absorbed or [])]
        if leftover:
            raise ValueError(
                f"{path} has epochs written AFTER compaction "
                f"({[os.path.basename(e) for e in leftover]}); their data "
                "is invisible to base-view readers — move them to a fresh "
                "dataset path and compact there"
            )
        for e in epochs:
            fsio.rmtree(e)
        if epochs:
            # a crash before the map rebuild left the epoch-based map
            # behind; refresh it against the base layout
            fsio.rmtree(fsio.join(path, FILE_MAP_DIR))
            ensure_file_map(spark, path)
        return 0
    if not epochs:
        return 0
    # explicit schemas: epochs written across the payload_ck format
    # revision must compact deterministically (see read_chunks note)
    chunks = spark.read.schema(ENCODED_DDL).parquet(
        *[fsio.join(e, CHUNKS_DIR) for e in epochs]
    )
    (
        # repartition on chunk_id: the compacted rewrite must keep each
        # chunk's rows within ONE output file (Spark's read can split a
        # source file mid-chunk at a row-group boundary) so the
        # colocated read path stays valid after maintenance. One extra
        # shuffle during a one-time compaction buys every future read
        # its shuffle-free plan — the right trade at 100 TB.
        chunks.repartition("chunk_id")
        .write.mode("overwrite")
        .option("compression", "uncompressed")
        .parquet(fsio.join(path, CHUNKS_DIR))
    )
    manifest = spark.read.schema(_MANIFEST_DDL).parquet(
        *[fsio.join(e, MANIFEST_DIR) for e in epochs]
    )
    fsio.write_text(
        fsio.join(path, SCHEMA_FILE),
        fsio.read_text(fsio.join(epochs[0], SCHEMA_FILE)),
    )
    fsio.write_text_atomic(
        fsio.join(path, COMPACTED_FILE),
        json.dumps({"epochs": [os.path.basename(e) for e in epochs]}),
    )
    manifest.write.mode("overwrite").parquet(fsio.join(path, MANIFEST_DIR))
    for e in epochs:
        fsio.rmtree(e)
    # the old map rows reference epoch files that no longer exist —
    # rebuild against the fresh base layout
    fsio.rmtree(fsio.join(path, FILE_MAP_DIR))
    ensure_file_map(spark, path)
    return len(epochs)


def read_decoded(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    decimal_formats: dict[str, tuple[int, int]] | None = None,
    colocated: bool = False,
) -> DataFrame:
    """Full decode of a persisted dataset (optionally projected).
    ``decimal_formats`` rescales stored decimal columns on read
    (parquet4s rescaleOnRead, HALF_UP — see decoder._rescale_decimal).

    ``colocated=True`` FUSES the whole-file chunk reader with the
    decode worker in a single mapInArrow stage: no chunk_id exchange,
    and payload bytes never cross a process boundary (disk -> pyarrow
    read -> decode -> decoded rows out). Measured (480k rows,
    interleaved pinned pairs): shuffle write 107.1 MB -> 0.005 MB (the
    payload exchange is gone; only the file list shuffles), total CPU
    8.2 vs 9.0 CPU-s (wins), wall ~1.8 vs ~1.4 s (loses slightly at
    bench scale — static size-bins vs AQE's runtime partitioning). The
    trade GROWS with data: at 100 TB the eliminated exchange is ~10 TB
    of shuffle disk+network per full read, plus no shuffle files to
    lose on executor death. Local/s3 datasets written by this engine;
    the decoder raises loudly if the colocation precondition does not
    hold (e.g. a pre-r8 compaction split a chunk across files), so it
    never mis-decodes — fall back to the default path there."""
    schema = read_schema(path)
    if colocated:
        fused = fused_decode(
            spark, path, schema, columns=columns,
            decimal_formats=decimal_formats,
        )
        if fused is not None:
            return fused
        # empty dataset: fall through to the standard (empty) plan
    return decode_table(
        read_chunks(spark, path), schema, columns=columns,
        decimal_formats=decimal_formats,
    )


def fused_decode(
    spark: SparkSession,
    path: str,
    schema: "T.StructType",
    columns: list[str] | None = None,
    decimal_formats: dict[str, tuple[int, int]] | None = None,
    files: "list[tuple[str, int]] | None" = None,
) -> "DataFrame | None":
    """The fused (reader + decoder, one mapInArrow stage) plan over a
    persisted dataset, or None when there are no part files. ``files``
    restricts the read to an explicit (full_path, size) subset — the
    file-pruned scan path. See read_decoded for the measured trade.
    None also for JVM-only schemes (hdfs://, viewfs://) — the worker
    has no pyarrow handle there; callers fall back to the default
    Spark-scan plan."""
    if not fsio.pyarrow_openable(path):
        return None
    fdf = _colocated_file_df(spark, path, files=files)
    if fdf is None:
        return None
    from .decoder import decode_worker

    ordered, out_schema, decode_fn = decode_worker(
        schema, columns=columns, decimal_formats=decimal_formats,
    )

    def fused(it):
        import pyarrow as pa

        pa.set_cpu_count(1)

        def chunk_rows():
            for batch in it:
                yield from _chunk_file_batches(
                    batch.column("file").to_pylist(), ordered
                )

        yield from decode_fn(chunk_rows())

    return fdf.mapInArrow(fused, out_schema)


def verify_dataset(
    spark: SparkSession,
    path: str,
    deep: "bool | float" = False,
    scrub_slice: int = 0,
) -> dict:
    """fsck for an encoded dataset: cross-check manifest against chunk
    files and (``deep=True``) scrub every payload's stored checksum.

    At 100 TB a dataset is maintained for years across resumes,
    appends, compactions and storage migrations; this is the audit that
    says "every committed chunk is present, exactly once, and intact"
    without decoding anything. Detects, per (chunk_id, column) key:
    manifest rows whose chunk payload is gone (lost files), chunk rows
    the manifest never committed (orphans from a crashed write — the
    manifest-commits-chunks protocol makes these invisible to readers,
    but they cost storage), duplicate keys on either side (a resume
    bug would double-append), and stored-checksum divergence between
    the manifest copy and the chunk copy. ``deep=True`` additionally
    re-computes every payload's md5 checksum from its bytes (the same
    verification decode performs, but over ALL columns without
    decoding) — the scheduled-scrub pattern object stores recommend
    for bit rot. Runs as one metadata aggregation (+ one payload scan
    when deep); returns a dict of counts with ``ok``.

    Datasets written before the checksum column report their payloads
    as ``payloads_unchecked`` rather than failing. A write that crashed
    before creating any manifest (chunks exist, manifest dir absent)
    reports every chunk as ``missing_in_manifest`` instead of raising
    Spark's path error. The audit covers COMMITTED data: epoch dirs
    without a committed manifest are invisible to readers by protocol
    and are not scanned here.

    ``deep`` may also be a FRACTION in (0, 1): ``deep=True`` reads
    every payload byte — right for a one-off audit, too expensive as a
    SCHEDULED scrub at 100 TB. A fraction scrubs a deterministic
    1/round(1/deep) slice of (chunk_id, column) keys selected by
    ``pmod(xxhash64(chunk_id, column), n_slices) == scrub_slice`` —
    pure metadata, no RNG state — so a scheduler stepping
    ``scrub_slice`` 0,1,2,... covers DISJOINT slices and the whole
    dataset every n_slices passes (the object-store rolling-scrub
    pattern). ``payloads_scanned`` reports the slice size."""
    from pyspark.errors import AnalysisException

    chunks = read_chunks(spark, path)
    try:
        manifest = read_manifest(spark, path)
    except AnalysisException:
        manifest = spark.createDataFrame([], _MANIFEST_DDL)
    key = ["chunk_id", "column"]
    m_ck = (
        F.col("payload_ck")
        if "payload_ck" in manifest.columns
        else F.lit(None).cast("bigint")
    )
    c_ck = (
        F.col("payload_ck")
        if "payload_ck" in chunks.columns
        else F.lit(None).cast("bigint")
    )
    m = manifest.groupBy(*key).agg(
        F.count("*").alias("m_n"), F.min(m_ck).alias("m_ck")
    )
    c = chunks.groupBy(*key).agg(
        F.count("*").alias("c_n"), F.min(c_ck).alias("c_ck")
    )
    j = m.join(c, key, "full_outer")
    flag = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    row = j.agg(
        F.count("*").alias("keys"),
        flag(F.col("c_n").isNull()).alias("missing_in_chunks"),
        flag(F.col("m_n").isNull()).alias("missing_in_manifest"),
        flag(F.col("m_n") > 1).alias("dup_manifest_keys"),
        flag(F.col("c_n") > 1).alias("dup_chunk_keys"),
        flag(
            F.col("m_ck").isNotNull()
            & F.col("c_ck").isNotNull()
            & (F.col("m_ck") != F.col("c_ck"))
        ).alias("metadata_ck_mismatches"),
    ).collect()[0]
    out = {k: int(v or 0) for k, v in row.asDict().items()}
    if deep:
        import pyarrow as pa

        if deep is not True:
            f = float(deep)
            if not (0.0 < f < 1.0):
                raise ValueError(
                    f"deep must be True/False or a fraction in (0,1), got {deep!r}"
                )
            n_slices = max(1, round(1.0 / f))
            chunks = chunks.where(
                F.pmod(
                    F.xxhash64("chunk_id", "column"), F.lit(n_slices)
                ) == F.lit(scrub_slice % n_slices)
            )
        sel = chunks.select("payload", c_ck.alias("stored_ck"))

        def scrub(it):
            pa.set_cpu_count(1)
            for batch in it:
                cks = batch.column("stored_ck").to_pylist()
                payloads = batch.column("payload")
                bad = unchecked = 0
                for i, ck in enumerate(cks):
                    blob = payloads[i].as_py()
                    if blob is None:
                        # a NULL payload with a stored checksum IS
                        # corruption; without one it is unauditable
                        if ck is None:
                            unchecked += 1
                        else:
                            bad += 1
                    elif ck is None:
                        unchecked += 1
                    elif payload_ck(blob) != ck:
                        bad += 1
                yield pa.record_batch(
                    [
                        pa.array([bad], type=pa.int64()),
                        pa.array([unchecked], type=pa.int64()),
                        pa.array([batch.num_rows], type=pa.int64()),
                    ],
                    names=["bad", "unchecked", "n"],
                )

        agg = (
            sel.mapInArrow(scrub, "bad bigint, unchecked bigint, n bigint")
            .agg(
                F.sum("bad").alias("b"),
                F.sum("unchecked").alias("u"),
                F.sum("n").alias("n"),
            )
            .collect()[0]
        )
        out["payload_ck_mismatches"] = int(agg["b"] or 0)
        out["payloads_unchecked"] = int(agg["u"] or 0)
        out["payloads_scanned"] = int(agg["n"] or 0)
    out["ok"] = not (
        out["missing_in_chunks"]
        or out["missing_in_manifest"]
        or out["dup_manifest_keys"]
        or out["dup_chunk_keys"]
        or out["metadata_ck_mismatches"]
        or out.get("payload_ck_mismatches", 0)
    )
    return out


def register_view(
    spark: SparkSession,
    path: str,
    name: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Expose an encoded dataset as a Spark SQL temp view, so
    ``spark.sql(f"SELECT ... FROM {name}")`` runs over decoded rows —
    the parquet4s-user migration path to plain SQL."""
    df = read_decoded(spark, path, columns=columns)
    df.createOrReplaceTempView(name)
    return df


def resume_encode(
    df: DataFrame,
    path: str,
    group_cols: list[str],
    **encode_kwargs,
) -> int:
    """Encode only groups not yet committed in the manifest; append.

    Returns the number of (group) work units that were still missing.
    Chunk determinism (hash partitioning on group+salt, sorted rows,
    content-independent chunk ids) guarantees a resumed run reproduces
    byte-identical chunks for the missing groups.
    """
    spark = df.sparkSession
    manifest_path = fsio.join(path, MANIFEST_DIR)
    chunks_path = fsio.join(path, CHUNKS_DIR)
    key_expr = group_key_expr(group_cols)
    if not fsio.exists(manifest_path):
        if fsio.exists(fsio.join(chunks_path, "_SUCCESS")):
            # crashed between chunk write and manifest commit: the chunk
            # job itself completed (_SUCCESS), so recover the manifest.
            # Explicit read schema: columns the legacy chunk files lack
            # (bloom, payload_ck) surface as NULL — a dataset written
            # before they existed stays recoverable, deterministically
            chunk_rows = spark.read.schema(ENCODED_DDL).parquet(chunks_path)
            manifest = chunk_rows.select(
                *[c for c in MANIFEST_COLS if c in chunk_rows.columns]
            )
            manifest.write.mode("overwrite").parquet(manifest_path)
            have_manifest = True  # fall through: anti-join verifies it
        else:
            have_manifest = False  # fresh restart: every group pending
    else:
        have_manifest = True
    if not have_manifest:
        pending = df.withColumn("_gk", key_expr)
    else:
        committed_keys = (
            read_manifest(spark, path)
            .select("group_key")
            .distinct()
            .withColumn("_gk", F.col("group_key"))
            .drop("group_key")
        )
        # no broadcast hint: the committed-group set grows with the
        # dataset (AQE broadcasts it at runtime whenever it fits)
        pending = df.withColumn("_gk", key_expr).join(
            committed_keys, on="_gk", how="left_anti"
        )
    pend_groups = pending.select(*group_cols).distinct().persist()
    try:
        n_missing = pend_groups.count()
        if n_missing == 0:
            return 0
        # reuse the recorded salt plan: the resume encode then skips the
        # size-histogram pass over the pending rows (at 100 TB that pass
        # is itself a full read), and the recorded salts reproduce the
        # originally planned chunking as a stored fact. Duplicate
        # sidecar rows (an earlier crashed resume appended its slice
        # again) collapse via a deterministic max — for a group with NO
        # committed chunks any self-consistent plan yields correct,
        # internally consistent chunks.
        plan_path = fsio.join(path, SALT_PLAN_DIR)
        own_restricted_plan = False
        if (
            "salt_plan" not in encode_kwargs
            and encode_kwargs.get("salted", True)
            and not encode_kwargs.get("range_cols")
            and fsio.exists(plan_path)
        ):
            recorded = spark.read.parquet(plan_path)
            if {*group_cols, "_grp_bytes", "_n_salts"} <= set(recorded.columns):
                plan = (
                    recorded.join(pend_groups, on=group_cols, how="left_semi")
                    .groupBy(*group_cols)
                    .agg(
                        F.max("_grp_bytes").alias("_grp_bytes"),
                        F.max("_n_salts").alias("_n_salts"),
                    )
                    .persist()
                )
                # every pending group must be covered — a partial
                # sidecar (legacy or clipped) falls back to re-planning
                if plan.count() == n_missing:
                    encode_kwargs["salt_plan"] = plan
                    own_restricted_plan = True
                else:
                    plan.unpersist()
        write_encoded(
            pending.drop("_gk"), path, mode="append", group_cols=group_cols,
            **encode_kwargs,
        )
        if own_restricted_plan:
            # only the plan WE built here — never a caller-provided one
            encode_kwargs["salt_plan"].unpersist()
        return n_missing
    finally:
        pend_groups.unpersist()
