"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side contract is real and tested — schema, partitioning,
Arrow batch shape, UDF signatures — while the actual media decode is
STUBBED (image/audio libraries are not in this container): decoders
raise ``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic content-derived feature vector so pipelines remain
end-to-end testable (per the driver's multimodal mandate).
"""

from __future__ import annotations

import hashlib
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


def synthesize_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column(0).to_numpy()
            kinds = ["image", "audio", "video"]
            rows = {
                "media_id": ids,
                "kind": [kinds[i % 3] for i in ids],
                "mime": ["application/octet-stream"] * len(ids),
                "width": [(int(i) * 31) % 1920 + 16 for i in ids],
                "height": [(int(i) * 17) % 1080 + 16 for i in ids],
                "duration_ms": [int(i) * 1000 for i in ids],
                "payload": [
                    hashlib.sha256(f"media:{i}".encode()).digest() * 8 for i in ids
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


def _decode_image_real(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this container; "
        "run with fake=True for the deterministic stand-in"
    )


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

    mapInPandas keeps payloads in Arrow batches (no per-row pickling);
    at scale, batches stay bounded by spark.sql.execution.arrow.
    maxRecordsPerBatch regardless of payload size skew.
    """
    out_schema = "media_id long, kind string, features array<float>"

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                if fake:
                    feats.append(_fake_features(payload, dim).tolist())
                else:
                    feats.append(_decode_image_real(payload).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(fn, out_schema)


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
