"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with the dot product computed
JVM-side (``F.zip_with`` + ``F.aggregate`` in double precision — no
Python in the hot path). Scale path: random-hyperplane LSH bucketing
(signature via one Arrow-vectorized matmul), probing only the query's
bucket — the candidate set shrinks ~2^planes-fold before the exact
re-rank. An IVF variant would swap the bucketer for k-means cells; the
bucket-join topology below stays identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def dot_expr(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: F.Column, b: F.Column) -> F.Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    exclude_id=None,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    The query is a literal array (broadcast to every task); the scan is
    embarrassingly parallel, and the global top-k is a
    TakeOrderedAndProject — no full sort, no extra shuffle.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    out = df.select(
        F.col(id_col),
        cosine_expr(F.col(vec_col), q).alias("cosine"),
    )
    if exclude_id is not None:
        out = out.where(F.col(id_col) != F.lit(exclude_id))
    return out.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _sig_bucket_udf(num_planes: int, seed: int):
    """Pandas UDF: embedding -> int bucket from random hyperplane signs.

    The plane matrix is derived from the seed inside the worker
    (deterministic), so nothing large is captured in the closure.
    """

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        planes = None
        out = np.zeros(len(vecs), dtype=np.int64)
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if mat.size == 0:
            return pd.Series(out)
        planes = rng.standard_normal((mat.shape[1], num_planes))
        signs = (mat @ planes) > 0
        weights = (1 << np.arange(num_planes)).astype(np.int64)
        out = (signs * weights).sum(axis=1).astype(np.int64)
        return pd.Series(out)

    return bucket


def _banded_bucket_udf(num_bands: int, planes_per_band: int, seed: int):
    """Pandas UDF: embedding -> array of per-band hyperplane buckets
    (one int per band). OR-amplification across bands is what gives
    near-dup search recall; the plane matrix is derived from the seed
    inside the worker, so nothing large is captured in the closure."""
    total = num_bands * planes_per_band

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if mat.size == 0:
            return pd.Series([[] for _ in range(len(vecs))])
        planes = rng.standard_normal((mat.shape[1], total))
        signs = (mat @ planes) > 0  # (n, total)
        weights = (1 << np.arange(planes_per_band)).astype(np.int64)
        per_band = signs.reshape(len(mat), num_bands, planes_per_band)
        bkt = (per_band * weights).sum(axis=2).astype(np.int64)  # (n, bands)
        return pd.Series(list(bkt))

    return buckets


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    sample_rows: int = 4096,
    iters: int = 10,
    seed: int = 42,
    id_col: str | None = None,
) -> np.ndarray:
    """k-means-lite coarse quantizer for IVF: deterministic driver-side
    sample (ordered limit), a few numpy Lloyd iterations. At 100 TB the
    sample stays tiny (centroid count x dim), training is driver-side,
    and the expensive step — assignment — is one vectorized map over
    the data."""
    base = df.orderBy(id_col) if id_col else df
    sample = np.array(
        [list(r[0]) for r in base.select(vec_col).limit(sample_rows).collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_assign(df: DataFrame, vec_col: str, centroids: np.ndarray) -> DataFrame:
    """Add the IVF cell id column (vectorized argmin via one matmul per
    Arrow batch). Partitioning/bucketing the table on `_cell` makes
    probes partition-prunable."""
    cent_list = centroids.tolist()

    @F.pandas_udf(T.IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        cent = np.asarray(cent_list, dtype=np.float64)
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if mat.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        d2 = (mat**2).sum(axis=1)[:, None] - 2 * (mat @ cent.T) + (cent**2).sum(axis=1)[None, :]
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return df.withColumn("_cell", cell(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    exclude_id=None,
) -> DataFrame:
    """IVF approximate top-k: probe only the n_probe cells nearest the
    query, exact cosine re-rank inside them. With n_probe == n_cells
    the probe set covers every cell and the result is EXACTLY brute
    force — which is how the driver oracle checks this operator end to
    end (queries.q_ivf_ann)."""
    qv = np.asarray(query, dtype=np.float64)
    d2 = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in d2.argsort()[:n_probe]]
    cand = ivf_assign(df, vec_col, centroids).where(F.col("_cell").isin(probe))
    return brute_force_topk(cand, id_col, vec_col, query, k, exclude_id=exclude_id)


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    num_planes: int = 12,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's hyperplane bucket, exact
    cosine re-rank inside it. ``multiprobe=1`` (default) also probes
    every 1-bit-flip neighbor bucket — near neighbors most often differ
    from the query signature in exactly the planes they sit closest to,
    so the +num_planes extra buckets recover most of the single-bucket
    recall cliff at ~(1+planes)/2^planes of the data scanned.
    ``multiprobe=0`` probes only the exact bucket. At 100 TB the bucket
    filter is a partition-prunable IN-predicate on a precomputed bucket
    column."""
    rng = np.random.default_rng(seed)
    qv = np.asarray(query, dtype=np.float64)
    planes = rng.standard_normal((len(qv), num_planes))
    qsig = int(
        ((qv @ planes > 0) * (1 << np.arange(num_planes)).astype(np.int64)).sum()
    )
    probe = [qsig]
    if multiprobe >= 1:
        probe += [qsig ^ (1 << i) for i in range(num_planes)]
    bucket = _sig_bucket_udf(num_planes, seed)
    cand = df.withColumn("_bkt", bucket(F.col(vec_col))).where(
        F.col("_bkt").isin(probe)
    )
    return brute_force_topk(cand, id_col, vec_col, query, k)
