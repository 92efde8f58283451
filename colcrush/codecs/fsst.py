"""FSST-style symbol-table compression for string/binary blobs.

From-scratch, vectorized variant of the symbol-table string
compression FSST describes (Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020, public): a table of multi-byte
symbols replaces frequent substrings with 1-byte codes. We build the
table by recursive pair substitution (Gage's byte-pair encoding, a
public-domain technique): each round finds the most frequent byte
*pair* in the corpus and replaces it with a currently-unused byte
value. Because later rounds pair up earlier codes, symbols grow to
arbitrary length, like FSST's 2..8-byte symbols. Unlike per-byte FSST
encoding loops, every step here is a C-speed whole-corpus operation
(``np.bincount`` + ``bytes.replace``), which is what makes this viable
inside a Python worker at Spark scale.

Correctness invariants:
- replacement codes are byte values with ZERO occurrences in the
  ORIGINAL corpus (so decode's reverse substitution is unambiguous);
- a pair (x, y) with x == y is never chosen (overlapping matches would
  make ``bytes.replace`` ambiguous); for x != y matches can't overlap.

Plays the role of parquet-mr's string dictionary/plain fallback layer
under parquet4s (/root/reference/core/src/main/scala/com/github/
mjakubowski84/parquet4s/ParquetWriter.scala:79-84) for high-cardinality
text where dictionaries lose.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["train", "compress", "decompress"]

_SELF_PAIRS = np.arange(256) * 257  # indices of (x, x) pairs in 256*x+y space


def train(
    corpus: bytes,
    sample: bytes | None = None,
    max_symbols: int = 224,
    min_gain: int = 8,
) -> list[tuple[int, int, int]]:
    """Learn a substitution table [(code, x, y), ...] (application order).

    ``corpus`` is the FULL data the table will be applied to — free
    codes must be computed on it. ``sample`` (default: corpus, capped)
    is what pair counting runs on each round.
    """
    if len(corpus) < 16:
        return []
    counts = np.bincount(np.frombuffer(corpus, dtype=np.uint8), minlength=256)
    free = [c for c in range(255, -1, -1) if counts[c] == 0]
    if not free:
        return []
    if sample is None:
        sample = corpus if len(corpus) <= (1 << 20) else corpus[: (1 << 20)]
    scale = max(1.0, len(corpus) / max(1, len(sample)))
    table: list[tuple[int, int, int]] = []
    cur = sample
    for _ in range(min(max_symbols, len(free))):
        arr = np.frombuffer(cur, dtype=np.uint8)
        if len(arr) < 2:
            break
        pairs = arr[:-1].astype(np.uint32) * np.uint32(256) + arr[1:]
        pc = np.bincount(pairs, minlength=65536)
        pc[_SELF_PAIRS] = 0
        best = int(pc.argmax())
        n = int(pc[best])
        # each replacement saves 1 byte; table entry costs 3 bytes
        if n * scale < min_gain + 3:
            break
        x, y = best >> 8, best & 0xFF
        code = table_next_code(free)
        if code is None:
            break
        cur = cur.replace(bytes((x, y)), bytes((code,)))
        table.append((code, x, y))
    return table


def table_next_code(free: list[int]) -> int | None:
    return free.pop(0) if free else None


def compress(corpus: bytes, table: list[tuple[int, int, int]]) -> bytes:
    cur = corpus
    for code, x, y in table:
        cur = cur.replace(bytes((x, y)), bytes((code,)))
    return cur


def decompress(data: bytes, table: list[tuple[int, int, int]]) -> bytes:
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
