"""FSST-style symbol-table compression for string/binary blobs.

From-scratch, vectorized variant of symbol-table string compression in
the spirit of FSST (Boncz, Neumann, Leis — "FSST: Fast Random Access
String Compression", VLDB 2020, public): a table of multi-byte symbols
replaces frequent substrings with 1-byte codes. The table is built by
recursive pair substitution (Gage's byte-pair encoding, public domain):
each round finds the most frequent byte *pair* and replaces it with a
currently-unused byte value. Later rounds pair up earlier codes, so
symbols grow to arbitrary length — including exponential collapse of
long repeated runs (a pair of a code with itself doubles the covered
span each round), which is what lets this codec compete with LZ-class
compressors on templated text. Every step is a C-speed whole-corpus
operation (``np.bincount`` + ``bytes.replace``) — no per-byte Python —
which is what makes it viable inside a Spark worker.

Correctness invariants:
- replacement codes are byte values with ZERO occurrences in the
  ORIGINAL corpus, so decode's reverse substitution chain is exact;
- ``bytes.replace`` is greedy left-to-right for overlapping matches
  (e.g. 'YY' in 'YYY' replaces once), and the decode direction
  (1 byte -> pair) can never overlap, so the chain inverts exactly.

Plays the role of parquet-mr's string encoding layer under parquet4s
(/root/reference/core/src/main/scala/com/github/mjakubowski84/parquet4s/ParquetWriter.scala:79-84)
for high-cardinality text where dictionaries lose.
"""

from __future__ import annotations

import struct

import numpy as np

from ._native import load as _load_native

_native = _load_native()

__all__ = ["train", "compress", "decompress"]


def train(
    corpus: bytes,
    sample: bytes | None = None,
    max_symbols: int = 224,
    min_gain: int = 8,
    min_count_frac: float = 0.0003,
) -> list[tuple[int, int, int]]:
    """Learn a substitution table [(code, x, y), ...] (application order).

    ``corpus`` is the FULL data the table will be applied to — free
    codes must be computed on it. ``sample`` (default: capped corpus
    prefix) is what pair counting runs on each round.
    ``min_count_frac`` bounds the pass count: a symbol must be expected
    to replace at least that fraction of the sample's bytes, so cheap
    tail symbols don't each cost a full-corpus pass.
    """
    return train_with_residual(
        corpus, sample, max_symbols, min_gain, min_count_frac
    )[0]


def train_with_residual(
    corpus: bytes,
    sample: bytes | None = None,
    max_symbols: int = 224,
    min_gain: int = 8,
    min_count_frac: float = 0.0003,
) -> tuple[list[tuple[int, int, int]], bytes | None]:
    """train() plus the fully-substituted SAMPLE as a free byproduct:
    training applies each symbol to the sample as it learns, so the
    final sample IS the sequentially-compressed sample — callers use it
    as a size estimate, and as the actual payload when sample == corpus
    (any stream of valid codes decodes exactly). Returns
    (table, residual or None when no table was learned)."""
    if len(corpus) < 16:
        return [], None
    # presence scatter, not bincount: free-code detection only needs
    # WHICH bytes occur, and fancy-index store runs at memory speed
    # while np.bincount on uint8 is ~15x slower (int64 upcast inside)
    present = np.zeros(256, dtype=bool)
    present[np.frombuffer(corpus, dtype=np.uint8)] = True
    free = [c for c in range(255, -1, -1) if not present[c]]
    if not free:
        return [], None
    if sample is None:
        sample = corpus if len(corpus) <= (1 << 20) else corpus[: (1 << 20)]
    scale = max(1.0, len(corpus) / max(1, len(sample)))
    floor = max(min_gain + 3, int(min_count_frac * len(sample)))
    if _native is not None:
        table, residual = _native.train(
            sample, free, floor, scale, min_gain, max_symbols
        )
        return table, (residual if table else None)
    table: list[tuple[int, int, int]] = []
    cur = sample
    for _ in range(min(max_symbols, len(free))):
        arr = np.frombuffer(cur, dtype=np.uint8)
        if len(arr) < 2:
            break
        pairs = arr[:-1].astype(np.uint32) * np.uint32(256) + arr[1:]
        pc = np.bincount(pairs, minlength=65536)
        best = int(pc.argmax())
        n = int(pc[best])
        if n < floor or n * scale < min_gain + 3:
            break
        x, y = best >> 8, best & 0xFF
        code = free.pop(0)
        cur = cur.replace(bytes((x, y)), bytes((code,)))
        table.append((code, x, y))
    return table, (cur if table else None)


def compress_sequential(corpus: bytes, table: list[tuple[int, int, int]]) -> bytes:
    """Reference implementation: per-symbol bytes.replace chain."""
    cur = corpus
    for code, x, y in table:
        cur = cur.replace(bytes((x, y)), bytes((code,)))
    return cur


def _levels(table: list[tuple[int, int, int]]) -> list[list[tuple[int, int, int]]]:
    """Group symbols by dependency depth: a symbol whose pair components
    are plain bytes is level 0; one referencing a code is one deeper.
    Within a level no symbol can create or consume another's match, so
    a whole level applies in ONE vectorized pass."""
    depth: dict[int, int] = {}
    levels: list[list[tuple[int, int, int]]] = []
    for code, x, y in table:
        d = max(depth.get(x, -1), depth.get(y, -1)) + 1
        depth[code] = d
        while len(levels) <= d:
            levels.append([])
        levels[d].append((code, x, y))
    return levels


_BAND = 16


def compress(corpus: bytes, table: list[tuple[int, int, int]]) -> bytes:
    """Priority-banded greedy encode. Symbols enter the 64K lookup
    table in TRAINING ORDER, ``_BAND`` at a time; each band runs greedy
    left-to-right passes to convergence before the next band joins.
    This tracks the training trajectory (training learns symbol k on a
    corpus where symbols 1..k-1 are already applied) closely enough to
    match fully-sequential per-symbol application's ratio on code-like
    corpora, while needing ~2 linear scans per band instead of one scan
    per symbol. A final sweep catches cross-band matches exposed late.
    Identical bytes whether the C kernel or the numpy fallback runs
    (same greedy L2R semantics), so chunk identity never depends on the
    host toolchain. Any encode strategy that emits valid codes decodes
    exactly (decode is pure code->pair expansion), so leaving matches
    unapplied at an early-break only costs ratio, never correctness."""
    if not table or len(corpus) < 2:
        return corpus
    if _native is not None:
        return _native.compress_banded(corpus, table, _BAND)
    a = np.frombuffer(corpus, dtype=np.uint8)
    lut = np.full(65536, -1, dtype=np.int32)

    def _converge(arr: np.ndarray, max_passes: int) -> np.ndarray:
        for _ in range(max_passes):
            if len(arr) < 2:
                break
            before = len(arr)
            arr = _apply_level(arr, lut)
            if before - len(arr) < max(32, before >> 10):
                break
        return arr

    for k in range(0, len(table), _BAND):
        for code, x, y in table[k : k + _BAND]:
            lut[(x << 8) | y] = code
        a = _converge(a, 4)
    return _converge(a, 16).tobytes()


def _apply_level(a: np.ndarray, lut: np.ndarray) -> np.ndarray:
    if _native is not None:
        return _native.apply_pass(a, lut)
    pair16 = np.multiply(a[:-1], np.uint16(256), dtype=np.uint16)
    pair16 |= a[1:]
    codes = lut[pair16]
    idx = np.flatnonzero(codes >= 0)
    if len(idx) == 0:
        return a
    # greedy left-to-right overlap resolution: 2-byte matches overlap
    # only at consecutive positions; within each run of consecutive
    # match positions keep even offsets
    new_run = np.empty(len(idx), dtype=bool)
    new_run[0] = True
    np.not_equal(idx[1:], idx[:-1] + 1, out=new_run[1:])
    run_starts = idx[new_run]
    run_id = np.cumsum(new_run) - 1
    keep = ((idx - run_starts[run_id]) & 1) == 0
    kept = idx[keep]
    out = a.copy()
    out[kept] = codes[kept].astype(np.uint8)
    drop = np.zeros(len(a), dtype=bool)
    drop[kept + 1] = True
    return out[~drop]


def _expansions(table: list[tuple[int, int, int]]):
    """Full byte expansion of every possible byte value."""
    exp: dict[int, bytes] = {}
    for code, x, y in table:
        ex = exp.get(x, bytes((x,)))
        ey = exp.get(y, bytes((y,)))
        exp[code] = ex + ey
    flat = bytearray()
    starts = np.zeros(256, dtype=np.int64)
    lens = np.zeros(256, dtype=np.int64)
    for b in range(256):
        e = exp.get(b, bytes((b,)))
        starts[b] = len(flat)
        lens[b] = len(e)
        flat.extend(e)
    return np.frombuffer(bytes(flat), dtype=np.uint8), starts, lens


def decompress(data: bytes, table: list[tuple[int, int, int]]) -> bytes:
    """Single-pass vectorized decode: gather each byte's (precomputed,
    recursive) expansion from a flat table. Index math in int32 when the
    output fits (it always does for <2 GiB chunks), halving traffic."""
    if not table or not data:
        return data
    flat, starts, lens = _expansions(table)
    a = np.frombuffer(data, dtype=np.uint8)
    l = lens[a]
    total = int(l.sum())
    if _native is not None:
        return _native.expand(a, flat, starts, lens, total).tobytes()
    idt = np.int32 if total < 2**31 and len(flat) < 2**31 else np.int64
    l = l.astype(idt, copy=False)
    offs = np.zeros(len(a), dtype=idt)
    np.cumsum(l[:-1], out=offs[1:])
    # index = starts[a] + (arange(total) - repeat(offs))
    idx = np.repeat((starts.astype(idt)[a] - offs), l)
    idx += np.arange(total, dtype=idt)
    out = flat[idx]
    return out.tobytes()


def decompress_sequential(data: bytes, table: list[tuple[int, int, int]]) -> bytes:
    cur = data
    for code, x, y in reversed(table):
        cur = cur.replace(bytes((code,)), bytes((x, y)))
    return cur


def serialize_table(table: list[tuple[int, int, int]]) -> bytes:
    out = struct.pack("<H", len(table))
    for code, x, y in table:
        out += struct.pack("<BBB", code, x, y)
    return out


def deserialize_table(data: bytes, off: int = 0) -> tuple[list[tuple[int, int, int]], int]:
    (n,) = struct.unpack_from("<H", data, off)
    off += 2
    table = []
    for _ in range(n):
        code, x, y = struct.unpack_from("<BBB", data, off)
        off += 3
        table.append((code, x, y))
    return table, off
