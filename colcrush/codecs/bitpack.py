"""Vectorized bit-packing primitives (numpy only).

The lightweight-codec layer's lowest level: pack an array of
non-negative integers, each < 2**width, into a little-endian bit
stream. This re-implements (from scratch, numpy-vectorized) the role
parquet-mr's bit-packing plays under parquet4s's writer knobs
(/root/reference/core/src/main/scala/com/github/mjakubowski84/parquet4s/ParquetWriter.scala:79-84).
"""

from __future__ import annotations

import numpy as np

from ._native import load as _load_native

_native = _load_native()

__all__ = ["bit_width", "pack_bits", "unpack_bits"]


def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (0 -> 0 bits)."""
    if max_value <= 0:
        return 0
    return int(max_value).bit_length()


_FAST_WIDTHS = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values (< 2**width each) into a LE bit stream."""
    if width == 0 or len(values) == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if width in _FAST_WIDTHS:
        return v.astype(_FAST_WIDTHS[width]).tobytes()
    if _native is not None and width <= 56:
        # C accumulator kernel, byte-identical; 56-bit cap keeps the
        # 64-bit accumulator overflow-free (wider widths are rare and
        # take the numpy path). The kernel masks each value to the low
        # `width` bits, matching the numpy paths' implicit truncation
        # of out-of-range inputs (native==numpy byte identity).
        return _native.pack_bits(v, width)
    # general path: explode to an n x width bit matrix, pack LSB-first
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(data: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in _FAST_WIDTHS:
        return np.frombuffer(data, dtype=_FAST_WIDTHS[width], count=n).astype(np.uint64)
    if _native is not None and width <= 56:
        return _native.unpack_bits(data, width, n)
    total = n * width
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), count=total, bitorder="little"
    )
    m = bits.reshape(n, width).astype(np.uint64)
    weights = np.uint64(1) << np.arange(width, dtype=np.uint64)
    return (m * weights).sum(axis=1, dtype=np.uint64)
