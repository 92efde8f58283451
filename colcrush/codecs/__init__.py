"""colcrush codec kernels — pure numpy/pyarrow, no Spark dependency.

The per-column lightweight-compression layer: dictionary with sorted
dictionary pages, hybrid RLE/bit-packed runs, frame-of-reference +
bit-packing, delta, FSST-style symbol-table string compression, and
an arrow-IPC fallback for exotic types — auto-selected per chunk by
sampled size estimation (SURVEY.md §7, BASELINE.json north_star).
"""

from .bitpack import bit_width, pack_bits, unpack_bits
from .column import (
    CODEC_NAMES,
    DICT,
    FSST,
    INTS,
    IPC,
    PLAIN_FIXED,
    PLAIN_STR,
    decode_array,
    encode_array,
    register_value_codec,
    unregister_value_codec,
)
from .intcodec import decode_ints, encode_ints_best

__all__ = [
    "bit_width",
    "pack_bits",
    "unpack_bits",
    "encode_array",
    "decode_array",
    "register_value_codec",
    "unregister_value_codec",
    "encode_ints_best",
    "decode_ints",
    "CODEC_NAMES",
    "PLAIN_FIXED",
    "INTS",
    "PLAIN_STR",
    "DICT",
    "FSST",
    "IPC",
]
