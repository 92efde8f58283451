"""Deduplication operators for web-scale training-data pipelines.

Beyond the reference's surface (SURVEY.md mandate): exact dedup,
MinHash+LSH near-dup, SimHash near-dup, n-gram Jaccard — all as
compositions of built-in DataFrame ops (explode / groupBy / join) so
Catalyst plans the shuffles; no per-row Python anywhere except the
vectorized SimHash pandas_udf.

Scale notes (100 TB):
- exact dedup shuffles a 32-byte sha, never the content;
- MinHash banding turns all-pairs O(n^2) into per-bucket candidate
  joins; band buckets are hash-partitioned and AQE splits skewed ones;
- verification joins rejoin content only for candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str, keep: str = "min"
) -> DataFrame:
    """Keep one row per distinct text (content-hash grouped).

    Returns the deduplicated rows of ``df``. Shuffles only
    (sha256, id) pairs, then semi-joins the keepers back.
    """
    agg = F.min(F.col(id_col)) if keep == "min" else F.max(F.col(id_col))
    keepers = (
        df.select(F.sha2(F.col(text_col), 256).alias("_h"), F.col(id_col))
        .groupBy("_h")
        .agg(agg.alias(id_col))
        .select(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(keeper id, dup count) per distinct text — dedup lineage report."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("text_sha"), F.col(id_col))
        .groupBy("text_sha")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingles(text_col: str, n: int) -> F.Column:
    """Word n-gram shingles as an array column (JVM-side, no UDF)."""
    toks = F.split(F.col(text_col), " ")
    if n == 1:
        return F.array_distinct(toks)
    # sliding window via sequence + slice
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<int>) MinHash signatures, fully JVM-side:
    per seed, min over murmur3(shingle, seed)."""
    sh = _shingles(text_col, shingle_n).alias("_sh")
    base = df.select(F.col(id_col), sh)
    # explode shingles once, then num_hashes min-aggregates: whole-stage
    # codegen'd, map-side partial aggregation (64 ints per doc per
    # partition cross the shuffle), and no per-(doc,seed) array
    # allocation — the higher-order-function formulation allocated a
    # shingle-sized array per doc per seed and was ~10x slower
    inv = base.select(F.col(id_col), F.explode("_sh").alias("_tok"))
    aggs = [
        F.min(F.hash(F.col("_tok"), F.lit(i))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    grouped = inv.groupBy(id_col).agg(*aggs)
    return grouped.select(
        F.col(id_col),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidates.
    Returns distinct (a, b) with a < b.

    One posexplode (NOT a bands-way union: each union branch would
    re-evaluate the whole signature plan) -> self-equi-join on
    (band, bucket hash) that Catalyst shuffles once per side."""
    band_hashes = F.array(
        *[
            F.hash(*[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)])
            for b in range(bands)
        ]
    )
    buckets = sigs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(band_hashes).alias("_band", "_bh"),
    )
    l = buckets.alias("l")
    r = buckets.alias("r")
    return (
        l.join(
            r,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bh") == F.col("r._bh"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("a"), F.col("r._id").alias("b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
) -> DataFrame:
    """Near-duplicate pairs (a, b, jaccard) with estimated Jaccard >=
    threshold: MinHash -> LSH banding -> signature-level verification.
    The signature agreement fraction is the Jaccard estimate."""
    rows_per_band = num_hashes // bands
    # materialize signatures once: they feed the bucket join (2 sides)
    # and the verification join (2 sides) — without this the whole
    # shingle+minhash plan would re-run per branch
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n).localCheckpoint()
    cands = minhash_candidate_pairs(sigs, id_col, bands, rows_per_band)
    sl = sigs.select(F.col(id_col).alias("a"), F.col("sig").alias("_sa"))
    sr = sigs.select(F.col(id_col).alias("b"), F.col("sig").alias("_sb"))
    joined = cands.join(sl, "a").join(sr, "b")
    agree = F.size(
        F.filter(
            F.zip_with(F.col("_sa"), F.col("_sb"), lambda x, y: x == y),
            lambda z: z,
        )
    )
    est = (agree / F.lit(float(num_hashes))).alias("jaccard")
    return joined.select("a", "b", est).where(F.col("jaccard") >= threshold)


_SIMHASH_OUT = T.LongType()


@F.pandas_udf(_SIMHASH_OUT)
def _simhash64(tokens: pd.Series) -> pd.Series:
    """Vectorized 64-bit SimHash over token arrays (Arrow-batched)."""
    out = np.zeros(len(tokens), dtype=np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            continue
        hs = np.fromiter(
            (hash64(t) for t in toks), dtype=np.uint64, count=len(toks)
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(hs)
        out[i] = (weights[votes > 0]).sum(dtype=np.uint64)
    return pd.Series(out.view(np.int64))


def hash64(s: str) -> int:
    """Deterministic 64-bit string hash (md5 prefix — C speed per
    token, stable across processes unlike Python's builtin hash)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.col(text_col), " ")
    return df.select(F.col(id_col), _simhash64(toks).alias("simhash"))


def simhash_dedup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: 4x16-bit segment blocking (a pair
    within hamming<=3 must agree on >=1 of 4 segments), exact popcount
    verify via bit_count(xor) — all JVM-side after the signature UDF."""
    sigs = simhash_signatures(df, id_col, text_col).localCheckpoint()
    seg_keys = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), seg * 16).bitwiseAND(F.lit(0xFFFF))
            for seg in range(4)
        ]
    )
    buckets = sigs.select(
        F.col(id_col).alias("_id"),
        F.col("simhash").alias("_sh"),
        F.posexplode(seg_keys).alias("_seg", "_key"),
    )
    l, r = buckets.alias("l"), buckets.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l._seg") == F.col("r._seg"))
            & (F.col("l._key") == F.col("r._key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("a"),
            F.col("r._id").alias("b"),
            F.col("l._sh").alias("_sa"),
            F.col("r._sh").alias("_sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).alias("hamming")
    return cands.select("a", "b", ham).where(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold via
    explode + equi-join on shingles (inverted index), optionally
    blocked by ``block_col`` to bound the candidate space."""
    sh = _shingles(text_col, n)
    base = df.select(
        F.col(id_col).alias("_id"),
        *( [F.col(block_col).alias("_blk")] if block_col else [] ),
        sh.alias("_sh"),
    ).withColumn("_sz", F.size("_sh")).localCheckpoint()
    inv = base.select(
        "_id", "_sz", *( ["_blk"] if block_col else [] ), F.explode("_sh").alias("_tok")
    )
    l, r = inv.alias("l"), inv.alias("r")
    cond = (F.col("l._tok") == F.col("r._tok")) & (F.col("l._id") < F.col("r._id"))
    if block_col:
        cond = cond & (F.col("l._blk") == F.col("r._blk"))
    inter = (
        l.join(r, cond)
        .groupBy(F.col("l._id").alias("a"), F.col("r._id").alias("b"))
        .agg(
            F.count(F.lit(1)).alias("_inter"),
            F.first("l._sz").alias("_sza"),
            F.first("r._sz").alias("_szb"),
        )
    )
    jac = (
        F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter"))
    ).alias("jaccard")
    return inter.select("a", "b", jac).where(F.col("jaccard") >= threshold)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.98,
    num_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup: random-hyperplane LSH buckets ->
    in-bucket exact cosine (double precision, JVM-side)."""
    from .similarity import _sig_bucket_udf, cosine_expr

    bucket = _sig_bucket_udf(num_planes, seed)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        bucket(F.col(vec_col)).alias("_bkt"),
    )
    l, r = base.alias("l"), base.alias("r")
    pairs = l.join(
        r,
        (F.col("l._bkt") == F.col("r._bkt")) & (F.col("l._id") < F.col("r._id")),
    )
    cos = cosine_expr(F.col("l._v"), F.col("r._v")).alias("cosine")
    return (
        pairs.select(F.col("l._id").alias("a"), F.col("r._id").alias("b"), cos)
        .where(F.col("cosine") >= threshold)
    )
