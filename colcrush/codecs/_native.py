"""Optional C acceleration for the FSST-style codec hot loops.

The numpy implementation in fsst.py is the canonical, always-available
path; this module compiles (with the system C compiler, if present) a
tiny kernel for the two memory-bound inner loops — one greedy
pair-substitution pass and the decode byte-expansion — and exposes it
via ctypes. Both kernels implement EXACTLY the semantics of their numpy
counterparts (greedy left-to-right pair matching == even-offset-in-run
selection; decode = flat-table gather), so encoded bytes are identical
whichever path runs; tests/test_codecs.py asserts this equivalence.

No third-party installs: the C source is embedded here (so it travels
inside the --py-files zip to every executor), compiled once per host
into a content-addressed .so under the system temp dir, and loaded with
ctypes. Any failure (no compiler, sandboxed tmp, exotic platform)
degrades silently to the numpy path. Set COLCRUSH_NATIVE=0 to disable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = r"""
#include <string.h>

/* One greedy left-to-right pair-substitution pass.
   lut: 65536 int32, code >= 0 or -1. Returns output length.
   Semantics match the numpy even-offset-in-run rule: at a match,
   consume two bytes (skipping any overlapping match at i+1); new pairs
   formed by this pass's replacements are NOT matched within the pass. */
long colcrush_apply_pass(const unsigned char *in, long n, const int *lut,
                         unsigned char *out) {
    long i = 0, o = 0;
    while (i + 1 < n) {
        int code = lut[((unsigned)in[i] << 8) | in[i + 1]];
        if (code >= 0) {
            out[o++] = (unsigned char)code;
            i += 2;
        } else {
            out[o++] = in[i++];
        }
    }
    if (i < n)
        out[o++] = in[i];
    return o;
}

/* One in-place greedy pass (same semantics as colcrush_apply_pass).
   Writing at o <= i never clobbers unread input, so buf serves as both
   source and destination. Returns new length. */
static long apply_inplace(unsigned char *buf, long n, const int *lut) {
    long i = 0, o = 0;
    while (i + 1 < n) {
        int code = lut[((unsigned)buf[i] << 8) | buf[i + 1]];
        if (code >= 0) {
            buf[o++] = (unsigned char)code;
            i += 2;
        } else {
            buf[o++] = buf[i++];
        }
    }
    if (i < n)
        buf[o++] = buf[i];
    return o;
}

/* Whole priority-banded compression in one call: symbols (3 bytes
   each, application order) join the LUT `band` at a time; each band
   converges (<=4 passes, early-break when a pass shrinks less than
   max(32, n/1024)), then a final sweep of <=16 passes. Byte-identical
   to the Python band loop in fsst.py. Returns final length. */
long colcrush_compress_banded(unsigned char *buf, long n,
                              const unsigned char *table, long nsym,
                              long band, int *lut) {
    for (long p = 0; p < 65536; p++)
        lut[p] = -1;
    for (long k = 0; k < nsym; k += band) {
        long end = k + band < nsym ? k + band : nsym;
        for (long s = k; s < end; s++) {
            unsigned char code = table[s * 3];
            unsigned x = table[s * 3 + 1], y = table[s * 3 + 2];
            lut[(x << 8) | y] = code;
        }
        for (int pass = 0; pass < 4; pass++) {
            if (n < 2)
                break;
            long before = n;
            n = apply_inplace(buf, n, lut);
            long thresh = before >> 10;
            if (thresh < 32)
                thresh = 32;
            if (before - n < thresh)
                break;
        }
    }
    for (int pass = 0; pass < 16; pass++) {
        if (n < 2)
            break;
        long before = n;
        n = apply_inplace(buf, n, lut);
        long thresh = before >> 10;
        if (thresh < 32)
            thresh = 32;
        if (before - n < thresh)
            break;
    }
    return n;
}

/* Full training loop: repeatedly count adjacent byte pairs over the
   (shrinking) sample, pick the most frequent (FIRST max — ties break
   toward the numerically lowest pair, matching np.argmax), replace it
   in-place with the next free code, and record (code, x, y).
   Semantics identical to the numpy train loop in fsst.py.
   free: list of free codes in application order; n_free entries.
   Returns number of symbols written to out_table (3 bytes each).
   sample_len is updated through pn. */
long colcrush_train(unsigned char *buf, long *pn, const unsigned char *free_codes,
                    long n_free, long floor_count, double scale,
                    long min_gain, long max_symbols, long *counts,
                    unsigned char *out_table) {
    long n = *pn;
    long nsym = 0;
    /* second counter bank: interleaving two independent increment
       streams breaks the store-to-load dependency chain of the
       random-index histogram (measurably ~1.5x on this loop) */
    long *counts2 = counts + 65536;
    for (long s = 0; s < max_symbols && s < n_free; s++) {
        if (n < 2)
            break;
        memset(counts, 0, 2 * 65536 * sizeof(long));
        long m = n - 1;
        long i = 0;
        for (; i + 1 < m; i += 2) {
            counts[((unsigned)buf[i] << 8) | buf[i + 1]]++;
            counts2[((unsigned)buf[i + 1] << 8) | buf[i + 2]]++;
        }
        for (; i < m; i++)
            counts[((unsigned)buf[i] << 8) | buf[i + 1]]++;
        long best = 0, bc = counts[0] + counts2[0];
        for (long p = 1; p < 65536; p++) {
            long c = counts[p] + counts2[p];
            if (c > bc) { bc = c; best = p; }
        }
        if (bc < floor_count || (double)bc * scale < (double)(min_gain + 3))
            break;
        unsigned char x = (unsigned char)(best >> 8), y = (unsigned char)(best & 0xFF);
        unsigned char code = free_codes[s];
        /* greedy L2R non-overlapping replace, in place: memchr (SIMD)
           jumps to candidate positions, memmove bulk-copies the
           unmatched gaps — same output as the byte-at-a-time loop */
        long o = 0;
        i = 0;
        while (i + 1 < n) {
            const unsigned char *p =
                (const unsigned char *)memchr(buf + i, x, (size_t)(n - 1 - i));
            if (p == NULL) {
                break;
            }
            long j = (long)(p - buf);
            if (j > i) {
                memmove(buf + o, buf + i, (size_t)(j - i));
                o += j - i;
                i = j;
            }
            if (buf[i + 1] == y) {
                buf[o++] = code;
                i += 2;
            } else {
                buf[o++] = buf[i++];
            }
        }
        if (i < n) {
            memmove(buf + o, buf + i, (size_t)(n - i));
            o += n - i;
        }
        n = o;
        out_table[nsym * 3] = code;
        out_table[nsym * 3 + 1] = x;
        out_table[nsym * 3 + 2] = y;
        nsym++;
    }
    *pn = n;
    return nsym;
}

/* LSB-first bit packing: bit k of value i lands at stream bit i*w+k,
   bytes filled little-endian — byte-identical to the numpy
   packbits(bitorder='little') path. Each value is masked to the low
   w bits (w <= 56 caller-gated), matching numpy's implicit truncation
   of out-of-range inputs — an unmasked OR would corrupt every
   subsequent packed value. */
void colcrush_pack_bits(const unsigned long long *v, long n, int w,
                        unsigned char *out) {
    unsigned long long acc = 0;
    unsigned long long mask = (1ULL << w) - 1;
    int nb = 0;
    long o = 0;
    for (long i = 0; i < n; i++) {
        acc |= (v[i] & mask) << nb;
        nb += w;
        while (nb >= 8) {
            out[o++] = (unsigned char)(acc & 0xFF);
            acc >>= 8;
            nb -= 8;
        }
    }
    if (nb > 0)
        out[o++] = (unsigned char)(acc & 0xFF);
}

void colcrush_unpack_bits(const unsigned char *in, long n, int w,
                          unsigned long long *out) {
    unsigned long long acc = 0;
    int nb = 0;
    long ip = 0;
    unsigned long long mask = (w == 64) ? ~0ULL : ((1ULL << w) - 1);
    for (long i = 0; i < n; i++) {
        while (nb < w) {
            acc |= (unsigned long long)in[ip++] << nb;
            nb += 8;
        }
        out[i] = acc & mask;
        acc >>= w;
        nb -= w;
    }
}

/* Decode: expand every byte through its precomputed recursive
   expansion (flat table + starts/lens). Returns output length. */
long colcrush_expand(const unsigned char *in, long n,
                     const unsigned char *flat, const long *starts,
                     const long *lens, unsigned char *out) {
    long o = 0;
    for (long i = 0; i < n; i++) {
        unsigned char b = in[i];
        long l = lens[b];
        memcpy(out + o, flat + starts[b], (size_t)l);
        o += l;
    }
    return o;
}
"""


class _Kernels:
    def __init__(self, lib: ctypes.CDLL):
        self._apply = lib.colcrush_apply_pass
        self._apply.restype = ctypes.c_long
        self._apply.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
        ]
        self._expand = lib.colcrush_expand
        self._expand.restype = ctypes.c_long
        self._expand.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        self._pack = lib.colcrush_pack_bits
        self._pack.restype = None
        self._pack.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_void_p,
        ]
        self._unpack = lib.colcrush_unpack_bits
        self._unpack.restype = None
        self._unpack.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_void_p,
        ]
        self._banded = lib.colcrush_compress_banded
        self._banded.restype = ctypes.c_long
        self._banded.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_long, ctypes.c_void_p,
        ]
        self._train = lib.colcrush_train
        self._train.restype = ctypes.c_long
        self._train.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_void_p,
            ctypes.c_long, ctypes.c_long, ctypes.c_double, ctypes.c_long,
            ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
        ]

    def apply_pass(self, a: np.ndarray, lut: np.ndarray) -> np.ndarray:
        a = np.ascontiguousarray(a)
        out = np.empty(len(a), dtype=np.uint8)
        o = self._apply(
            a.ctypes.data, len(a), lut.ctypes.data, out.ctypes.data
        )
        return out[:o]

    def pack_bits(self, v: np.ndarray, width: int) -> bytes:
        # 64-bit accumulator: safe for width <= 56 (caller-gated)
        v = np.ascontiguousarray(v, dtype=np.uint64)
        out = np.empty((len(v) * width + 7) // 8, dtype=np.uint8)
        self._pack(v.ctypes.data, len(v), width, out.ctypes.data)
        return out.tobytes()

    def unpack_bits(self, data: bytes, width: int, n: int) -> np.ndarray:
        buf = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(n, dtype=np.uint64)
        self._unpack(buf.ctypes.data, n, width, out.ctypes.data)
        return out

    def compress_banded(
        self, corpus: bytes, table: list[tuple[int, int, int]], band: int
    ) -> bytes:
        buf = np.frombuffer(corpus, dtype=np.uint8).copy()
        tb = np.array(
            [b for sym in table for b in sym], dtype=np.uint8
        )
        lut = np.empty(65536, dtype=np.int32)
        n = self._banded(
            buf.ctypes.data, len(buf), tb.ctypes.data, len(table), band,
            lut.ctypes.data,
        )
        return buf[:n].tobytes()

    def train(
        self,
        sample: bytes,
        free_codes: list[int],
        floor_count: int,
        scale: float,
        min_gain: int,
        max_symbols: int,
    ) -> list[tuple[int, int, int]]:
        buf = np.frombuffer(sample, dtype=np.uint8).copy()
        free = np.array(free_codes, dtype=np.uint8)
        counts = np.empty(2 * 65536, dtype=np.int64)  # two interleaved banks
        out = np.empty(3 * max(1, max_symbols), dtype=np.uint8)
        n = ctypes.c_long(len(buf))
        nsym = self._train(
            buf.ctypes.data, ctypes.byref(n), free.ctypes.data, len(free),
            floor_count, scale, min_gain, max_symbols,
            counts.ctypes.data, out.ctypes.data,
        )
        table = [
            (int(out[i * 3]), int(out[i * 3 + 1]), int(out[i * 3 + 2]))
            for i in range(nsym)
        ]
        return table, buf[: n.value].tobytes()

    def expand(
        self,
        a: np.ndarray,
        flat: np.ndarray,
        starts: np.ndarray,
        lens: np.ndarray,
        total: int,
    ) -> np.ndarray:
        a = np.ascontiguousarray(a)
        out = np.empty(total, dtype=np.uint8)
        o = self._expand(
            a.ctypes.data, len(a), flat.ctypes.data,
            starts.ctypes.data, lens.ctypes.data, out.ctypes.data,
        )
        assert o == total
        return out


def _so_dir() -> str:
    """Per-user cache dir, created 0700: the shared temp dir is
    world-writable and the content-hash path is predictable, so another
    local user could pre-plant a malicious .so there — dlopening it
    would run arbitrary code inside every Spark worker. A private dir
    plus the ownership check in load() closes that."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    d = os.path.join(tempfile.gettempdir(), f"colcrush-{uid}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    return d


def _so_path() -> str:
    tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
    return os.path.join(_so_dir(), f"colcrush_native_{tag}.so")


def _safe_to_load(so: str) -> bool:
    """Only dlopen files we own that nobody else can write."""
    st = os.stat(so)
    if hasattr(os, "geteuid") and st.st_uid != os.geteuid():
        return False
    return (st.st_mode & 0o022) == 0


def _compile(so: str) -> None:
    d = os.path.dirname(so)
    src = os.path.join(d, f".{os.path.basename(so)}.{os.getpid()}.c")
    tmp = src[:-2] + ".so"
    with open(src, "w") as f:
        f.write(_SRC)
    try:
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", "-o", tmp, src],
            check=True,
            capture_output=True,
            timeout=60,
        )
        os.chmod(tmp, 0o500)  # owner read+exec only (see _safe_to_load)
        os.replace(tmp, so)  # atomic: concurrent workers race safely
    finally:
        for p in (src, tmp):
            try:
                os.unlink(p)
            except OSError:
                pass


_cached: object = False  # False = not tried yet; None = unavailable


def load() -> _Kernels | None:
    """Return the kernels, compiling on first use; None if unavailable."""
    global _cached
    if _cached is not False:
        return _cached
    if os.environ.get("COLCRUSH_NATIVE", "1") == "0":
        _cached = None
        return None
    try:
        so = _so_path()
        if not os.path.exists(so):
            _compile(so)
        if not _safe_to_load(so):
            _cached = None
            return None
        _cached = _Kernels(ctypes.CDLL(so))
    except Exception:  # noqa: BLE001 — any failure means numpy fallback
        _cached = None
    return _cached
