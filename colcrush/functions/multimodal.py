"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side contract — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested, and so is the image decode: a
pure-numpy decoder for two self-describing uncompressed formats (PPM
``P6`` and 24-bit ``BI_RGB`` BMP — both public specs: netpbm man pages
and the Windows BITMAPINFOHEADER layout) turns real payload bytes into
pixel arrays with no external media library. ``fake=True`` (the bench
default) substitutes a content-derived hash feature so the query slot
measures pure plumbing; ``fake=False`` runs the real decode. Audio and
video payloads have no codec in this container, so their ``fake=False``
features are byte-level histograms — real computation on the real
bytes, clearly documented as codec-free rather than a decode.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _synth_image(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) gradient tile — id-seeded, no RNG."""
    yy, xx = np.indices((h, w), dtype=np.int64)
    r = (xx * 3 + i * 7) % 256
    g = (yy * 5 + i * 11) % 256
    b = (xx + yy + i) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def synthesize_media_df(
    spark, n: int = 64, real_payloads: bool = False
) -> DataFrame:
    """Deterministic fake media table. ``real_payloads=True`` gives
    image rows genuine decodable payloads (PPM/BMP alternating by id,
    small id-seeded gradient tiles whose dims match the metadata
    columns); audio/video keep seeded opaque bytes (no codec here)."""
    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        kinds = ["image", "audio", "video"]

        def payload_for(i: int, w: int, h: int) -> bytes:
            if real_payloads and i % 3 == 0:  # image rows
                pix = _synth_image(int(i), w, h)
                return encode_ppm(pix) if i % 2 == 0 else encode_bmp(pix)
            return hashlib.sha256(f"media:{i}".encode()).digest() * 8

        for batch in it:
            ids = batch.column(0).to_numpy()
            # real payloads stay tiny (<=20x16 tiles) so tests remain
            # fast; metadata dims match the actual encoded raster
            widths = [
                (int(i) % 5) * 4 + 4 if real_payloads and i % 3 == 0
                else (int(i) * 31) % 1920 + 16
                for i in ids
            ]
            heights = [
                (int(i) % 4) * 4 + 4 if real_payloads and i % 3 == 0
                else (int(i) * 17) % 1080 + 16
                for i in ids
            ]
            rows = {
                "media_id": ids,
                "kind": [kinds[i % 3] for i in ids],
                "mime": [
                    (
                        ("image/x-portable-pixmap" if i % 2 == 0 else "image/bmp")
                        if real_payloads and i % 3 == 0
                        else "application/octet-stream"
                    )
                    for i in ids
                ],
                "width": widths,
                "height": heights,
                "duration_ms": [int(i) * 1000 for i in ids],
                "payload": [
                    payload_for(int(i), w, h)
                    for i, w, h in zip(ids, widths, heights)
                ],
            }
            yield pa.record_batch(
                [
                    pa.array(rows["media_id"], type=pa.int64()),
                    pa.array(rows["kind"], type=pa.string()),
                    pa.array(rows["mime"], type=pa.string()),
                    pa.array(rows["width"], type=pa.int32()),
                    pa.array(rows["height"], type=pa.int32()),
                    pa.array(rows["duration_ms"], type=pa.int64()),
                    pa.array(rows["payload"], type=pa.binary()),
                ],
                names=[f.name for f in MEDIA_SCHEMA.fields],
            )

    return spark.range(n).mapInArrow(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Pure-numpy image codecs: PPM (P6) and uncompressed 24-bit BMP.
# Both formats are self-describing and trivially seekable, so decode is
# a header parse + one vectorized frombuffer/reshape — no per-pixel
# Python, which is what keeps mapInPandas batches fast at scale.
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("PPM P6 encodes exactly 3 channels")
    return f"P6\n{w} {h}\n255\n".encode("ascii") + a.tobytes()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BI_RGB BMP
    (bottom-up rows, 4-byte row padding per the public format)."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("24-bit BMP encodes exactly 3 channels")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    data = rows[::-1].tobytes()  # bottom-up
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


def _ppm_header(buf: bytes) -> tuple[int, int, int, int]:
    """Parse the P6 header: (width, height, maxval, data_offset).
    Whitespace-separated tokens; '#' starts a comment to end-of-line;
    exactly ONE whitespace byte separates maxval from the raster."""
    toks: list[int] = []
    i = 2  # past the b"P6" magic
    while len(toks) < 3:
        while i < len(buf):
            c = buf[i]
            if c in b" \t\r\n":
                i += 1
            elif c == ord("#"):
                nl = buf.find(b"\n", i)
                i = len(buf) if nl < 0 else nl + 1
            else:
                break
        j = i
        while j < len(buf) and buf[j] not in b" \t\r\n":
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(int(buf[i:j]))
        i = j
    return toks[0], toks[1], toks[2], i + 1  # +1: the single separator byte


def _decode_ppm(payload: bytes) -> np.ndarray:
    w, h, maxval, off = _ppm_header(payload)
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (only 8-bit)")
    n = w * h * 3
    if len(payload) - off < n:
        raise ValueError("PPM raster shorter than header promises")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
        .reshape(h, w, 3)
        .copy()
    )


def _decode_bmp(payload: bytes) -> np.ndarray:
    if len(payload) < 54:
        raise ValueError("BMP shorter than its fixed headers")
    _, _, _, _, data_off = struct.unpack_from("<2sIHHI", payload, 0)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40:
        raise ValueError("only BITMAPINFOHEADER (>=40 byte) BMPs supported")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"only uncompressed 24-bit BI_RGB BMPs supported (got "
            f"bpp={bpp}, compression={comp})"
        )
    abs_h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(payload) - data_off < stride * abs_h:
        raise ValueError("BMP raster shorter than header promises")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * abs_h, offset=data_off
    ).reshape(abs_h, stride)
    bgr = rows[:, : w * 3].reshape(abs_h, w, 3)
    rgb = bgr[:, :, ::-1]
    if h > 0:  # positive height = bottom-up storage
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a self-describing image payload to an (h, w, 3) uint8 RGB
    array. Supports PPM P6 and uncompressed 24-bit BMP (pure numpy — no
    PIL/opencv in this container); other magics raise ValueError."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise ValueError(
        "unsupported image format (expected PPM 'P6' or BMP 'BM' magic); "
        f"payload starts with {payload[:4]!r}"
    )


def image_features(pixels: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic feature vector from decoded pixels: per-channel
    mean+std (6) then a luminance histogram filling the remaining
    slots. Pure vectorized numpy — the per-batch cost is O(pixels)."""
    a = pixels.astype(np.float32) / 255.0
    means = a.mean(axis=(0, 1))
    stds = a.std(axis=(0, 1))
    lum = a @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    nbins = max(dim - 6, 1)
    hist, _ = np.histogram(lum, bins=nbins, range=(0.0, 1.0))
    hist = hist.astype(np.float32) / max(lum.size, 1)
    feat = np.concatenate([means, stds, hist]).astype(np.float32)
    if feat.size < dim:
        feat = np.pad(feat, (0, dim - feat.size))
    return feat[:dim]


def byte_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Codec-free features for payloads we cannot decode (audio/video —
    no codec in this container): a normalized byte-value histogram.
    Real computation on the real bytes, NOT a decode."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    return (hist.astype(np.float32) / max(arr.size, 1)).astype(np.float32)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic content-derived feature vector (decode stand-in)."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    df: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """media table -> (media_id, kind, features array<float>).

    ``fake=True`` (bench default — measures pure plumbing) hashes the
    payload into a deterministic vector. ``fake=False`` runs the REAL
    path: image payloads are decoded (PPM/BMP, pure numpy) and pooled
    into pixel statistics; audio/video payloads get byte-histogram
    features (no codec in this container — documented fallback, still
    computed from the actual bytes).

    mapInPandas keeps payloads in Arrow batches (no per-row pickling);
    at scale, batches stay bounded by spark.sql.execution.arrow.
    maxRecordsPerBatch regardless of payload size skew.
    """
    out_schema = "media_id long, kind string, features array<float>"

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if fake:
                    feats.append(_fake_features(payload, dim).tolist())
                elif kind == "image":
                    feats.append(
                        image_features(decode_image(bytes(payload)), dim).tolist()
                    )
                else:
                    feats.append(byte_features(bytes(payload), dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(fn, out_schema)


def decode_dims(df: DataFrame) -> DataFrame:
    """Integer ground-truth of the REAL image decode: per image row,
    the decoded (width, height, channels) plus per-channel plain and
    raster-position-weighted pixel sums, all from the decoded array.

    These are exactly recomputable integers (the synthesized tiles are
    pure functions of media_id), so this is the oracle-checkable half
    of the multimodal slot: a decode bug — BMP BGR swap missed, the
    bottom-up row flip dropped, stride padding read as pixels, a PPM
    header off-by-one — shifts a sum and breaks the hash match. The
    position-weighted sums make the check ORDER-sensitive (a flipped
    raster keeps plain sums but not weighted ones). Float pixel stats
    stay in the rows-only ``extract_features`` slot.
    """
    out_schema = (
        "media_id long, width int, height int, channels int, "
        "r_sum long, g_sum long, b_sum long, "
        "r_wsum long, g_wsum long, b_wsum long"
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pix = decode_image(bytes(payload)).astype(np.int64)
                h, w, c = pix.shape
                pos = np.arange(h * w, dtype=np.int64).reshape(h, w, 1)
                sums = pix.sum(axis=(0, 1))
                wsums = (pix * pos).sum(axis=(0, 1))
                rows.append(
                    (int(mid), w, h, c, *map(int, sums), *map(int, wsums))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels",
                    "r_sum", "g_sum", "b_sum",
                    "r_wsum", "g_wsum", "b_wsum",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(fn, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) —
    pure JVM-side sequence explode; the decode itself is the stubbed
    stage above."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
