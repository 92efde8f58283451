"""Benchmark-contamination detection for training-data pipelines.

Before training on a web corpus, every document must be checked for
n-gram overlap against held-out evaluation sets (the standard
decontamination step): a document sharing a large fraction of its
shingles with a benchmark leaks test data into training. This is the
same inverted-index machinery as n-gram Jaccard dedup
(operators/dedup.py), pointed at a corpus x reference pair instead of
corpus x itself.

Scale shape (100 TB corpus, MB-GB reference): shingles are hashed to
xxhash64 longs on both sides so no strings cross the shuffle; the
reference's distinct shingle-hash set is small (benchmarks are tiny
next to the corpus) and the join is a plain equi-join Catalyst/AQE can
broadcast when it fits — no hint, per the SCALE.md manifest-join rule.
Output is one row per corpus document with its overlap fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _shingles


def contamination_overlap(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    ref_text_col: str | None = None,
    n: int = 3,
) -> DataFrame:
    """Per-document overlap fraction against a reference set.

    Returns (``id_col``, n_shingles, n_hits, contamination) where
    contamination = n_hits / n_shingles over the document's DISTINCT
    word ``n``-gram shingles; a document with no shingles (short text)
    reports 0 shingles and null contamination, so thresholding keeps
    it. Shingles are compared via xxhash64 (collisions: ~2^-64 per
    candidate pair — astronomically below any decontamination
    threshold's sensitivity).
    """
    ref_text_col = ref_text_col or text_col
    doc_sh = corpus.select(
        F.col(id_col),
        F.explode_outer(_shingles(text_col, n)).alias("_tok"),
    ).select(
        id_col,
        # null for the explode_outer placeholder of a shingle-less doc:
        # xxhash64(NULL) would otherwise hash the seed and count as a
        # (joinable!) shingle
        F.when(F.col("_tok").isNotNull(), F.xxhash64("_tok")).alias("_h"),
    )
    ref_sh = (
        reference.select(F.explode(_shingles(ref_text_col, n)).alias("_tok"))
        .select(F.xxhash64("_tok").alias("_h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = doc_sh.join(ref_sh, "_h", "left")
    return joined.groupBy(id_col).agg(
        F.count("_h").alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hits"),
        F.when(
            F.count("_h") > 0,
            F.round(F.coalesce(F.sum("_hit"), F.lit(0)) / F.count("_h"), 6),
        ).alias("contamination"),
    )
