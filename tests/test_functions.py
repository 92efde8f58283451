"""Text-analysis + multimodal + sources/streaming tests."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from colcrush.functions.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media_df,
)
from colcrush.functions.text import (
    fingerprint_md5,
    lang_id,
    quality_score,
    token_count,
    token_count_regex,
    winnow_fingerprints,
)
from colcrush.sources import parquet as src
from colcrush.sources.memory import bytes_to_table, table_to_bytes


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (0, "the cat and the dog sat of the mat"),
        (1, "der hund und die katze ist der beste und der"),
        (2, "le chat est la le meilleur est la"),
        (3, "el gato es el mejor de los gatos es el"),
        (4, "这是的一个测试是了这是的"),
        (5, ""),
        (6, "word"),
    ]
    return spark.createDataFrame(rows, ["id", "text"]).cache()


def test_lang_id(spark, texts):
    got = {r["id"]: r["l"] for r in texts.select("id", lang_id(F.col("text")).alias("l")).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr"
    assert got[3] == "es" and got[4] == "zh"
    assert got[5] == "und" and got[6] == "und"


def test_token_count(spark, texts):
    got = {r["id"]: r["n"] for r in texts.select("id", token_count(F.col("text")).alias("n")).collect()}
    assert got[0] == 9 and got[5] == 0 and got[6] == 1
    got2 = {
        r["id"]: r["n"]
        for r in texts.select("id", token_count_regex(F.col("text")).alias("n")).collect()
    }
    assert got2[0] == 9 and got2[6] == 1


def test_quality_and_fingerprints(spark, texts):
    rows = texts.select(
        "id",
        quality_score(F.col("text")).alias("q"),
        fingerprint_md5(F.col("text")).alias("fp"),
        winnow_fingerprints(F.col("text")).alias("wf"),
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert 0 <= by_id[0]["q"] <= 1.5
    assert by_id[0]["fp"] != by_id[1]["fp"]
    assert len(by_id[0]["wf"]) > 0 and by_id[5]["wf"] == []
    # determinism: same text -> same winnow set
    again = texts.select("id", winnow_fingerprints(F.col("text")).alias("wf")).collect()
    assert {r["id"]: r["wf"] for r in again}[0] == by_id[0]["wf"]


def test_multimodal_plumbing(spark):
    media = synthesize_media_df(spark, 30)
    assert media.count() == 30
    feats = extract_features(media, dim=8, fake=True)
    rows = feats.collect()
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic: same payload -> same features
    feats2 = {r["media_id"]: r["features"] for r in extract_features(media, dim=8, fake=True).collect()}
    assert feats2[0] == [r for r in rows if r["media_id"] == 0][0]["features"]
    plan = frame_sample_plan(media, every_ms=5000)
    assert plan.where(F.col("media_id") == 2).count() > 0


def test_image_codec_roundtrips():
    """PPM and BMP encode/decode are exact inverses on arbitrary RGB
    tiles, including non-multiple-of-4 widths (BMP row padding) and a
    PPM header carrying comments."""
    import numpy as np

    from colcrush.functions.multimodal import (
        decode_image,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (3, 5), (7, 6), (16, 13)]:
        pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_ppm(pix)), pix)
        assert np.array_equal(decode_image(encode_bmp(pix)), pix)
    # PPM comments between header tokens are part of the public format
    pix = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    commented = b"P6\n# a comment\n3 2\n# another\n255\n" + pix.tobytes()
    assert np.array_equal(decode_image(commented), pix)
    # unknown magic fails loudly, never returns garbage pixels
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"\x89PNG\r\n\x1a\n")
    # truncated raster fails loudly too
    with pytest.raises(ValueError, match="shorter"):
        decode_image(encode_ppm(pix)[:-2])


def test_multimodal_real_decode(spark):
    """fake=False runs the REAL path end-to-end through mapInPandas:
    image payloads (PPM/BMP alternating) decode to pixels and pool to
    deterministic statistics; audio/video get byte-histogram features."""
    import numpy as np

    from colcrush.functions.multimodal import (
        _synth_image,
        image_features,
    )

    media = synthesize_media_df(spark, 30, real_payloads=True)
    rows = extract_features(media, dim=8, fake=False).collect()
    assert len(rows) == 30 and all(len(r["features"]) == 8 for r in rows)
    by_id = {r["media_id"]: r for r in rows}
    # cross-check one image row against a driver-side decode of the
    # same deterministic tile (id 6 -> PPM, id 3 -> BMP)
    for i in (6, 3):
        w = (i % 5) * 4 + 4
        h = (i % 4) * 4 + 4
        exp = image_features(_synth_image(i, w, h), dim=8)
        got = np.array(by_id[i]["features"], dtype=np.float32)
        assert np.allclose(got, exp, atol=1e-6), (i, got, exp)
    # features are real pixel statistics: histogram+means sum to a
    # plausible bounded range, not hash noise
    assert all(0.0 <= f <= 1.0 for f in by_id[6]["features"][:3])
    # determinism across runs
    again = {
        r["media_id"]: r["features"]
        for r in extract_features(media, dim=8, fake=False).collect()
    }
    assert again == {r["media_id"]: r["features"] for r in rows}
    # non-image payloads went through the codec-free byte histogram:
    # normalized, sums to ~1
    aud = by_id[1]["features"]
    assert abs(sum(aud) - 1.0) < 1e-5


def test_multimodal_decode_dims_integers(spark):
    """decode_dims returns exact integers from the REAL decode; the
    position-weighted sums are raster-order-sensitive, so a missed BMP
    bottom-up flip or BGR swap would break them (this mirrors the
    multimodal_dims DuckDB oracle, which recomputes the same sums from
    the tile formula without any image parser)."""
    import numpy as np

    from colcrush.functions.multimodal import _synth_image, decode_dims

    media = synthesize_media_df(spark, 30, real_payloads=True)
    rows = {
        r["media_id"]: r
        for r in decode_dims(media.where(F.col("kind") == "image")).collect()
    }
    assert sorted(rows) == [i for i in range(30) if i % 3 == 0]
    for i in (0, 6, 3, 9):  # PPM (even) and BMP (odd) rows
        w, h = (i % 5) * 4 + 4, (i % 4) * 4 + 4
        pix = _synth_image(i, w, h).astype(np.int64)
        pos = np.arange(h * w).reshape(h, w, 1)
        r = rows[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert [r["r_sum"], r["g_sum"], r["b_sum"]] == pix.sum((0, 1)).tolist()
        assert [r["r_wsum"], r["g_wsum"], r["b_wsum"]] == (
            (pix * pos).sum((0, 1)).tolist()
        )


def test_inmemory_parquet_roundtrip():
    import pyarrow as pa

    tbl = pa.table({"a": [1, 2, 3], "s": ["x", None, "z"]})
    data = table_to_bytes(tbl)
    back = bytes_to_table(data)
    assert back.equals(tbl)
    proj = bytes_to_table(data, columns=["s"])
    assert proj.column_names == ["s"]


def test_sources_parity(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("part"),
        F.struct(F.col("id").alias("inner")).alias("nested"),
    )
    p = str(tmp_path / "t")
    src.write_partitioned(df, p, ["part"], max_records_per_file=10)
    back = src.read_partitioned(spark, p)
    assert back.count() == 100
    assert set(back.columns) == {"id", "part", "nested"}
    proj = src.read_projected(spark, p, [("nested.inner", "inner_alias"), "part"])
    assert proj.columns == ["inner_alias", "part"]
    filt = src.read_filtered(spark, p, F.col("id") < 10)
    assert filt.count() == 10
    # pushdown visible in the plan
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(id,10)" in plan
    rf = src.record_filter(back, 5, 15, "id")
    assert rf.count() == 10
    assert rf.agg(F.min("id")).collect()[0][0] == 5


def test_write_create_mode(spark, tmp_path):
    df = spark.range(5)
    p = str(tmp_path / "w")
    src.write(df, p)
    with pytest.raises(Exception):
        src.write(df, p)  # CREATE refuses existing (IOOps.scala:37-56)
    src.write(df, p, mode="overwrite")


def test_streaming_rotating_sink(spark, tmp_path):
    from colcrush.streaming.sink import via_parquet

    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, None).otherwise((F.col("id") % 2).cast("string")).alias("part"),
    )
    df.write.parquet(src_dir)

    seen = {}

    def post(bdf, epoch, state):
        seen["parts"] = state.partitions
        seen["n"] = state.processed_record_count
        seen["marker"] = state.flush()  # manual flush (PostWriteState parity)

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    q = via_parquet(
        stream,
        out_dir,
        ["part"],
        ck,
        max_records_per_file=50,
        default_partition="__default__",
        pre_write=lambda d: d.withColumn("doubled", F.col("id") * 2),
        post_write=post,
    )
    q.awaitTermination(60)
    out = spark.read.parquet(out_dir)
    assert out.count() == 200
    assert out.where(F.col("part") == "__default__").count() == 67
    assert "doubled" in out.columns
    assert ("__default__",) in seen["parts"]
    assert seen["n"] == 200
    parts_dirs = [d for d in os.listdir(out_dir) if d.startswith("part=")]
    assert len(parts_dirs) == 3
    # manual flush left a durable consistency marker
    from colcrush.streaming.sink import last_flushed_epoch

    assert os.path.exists(seen["marker"])
    assert last_flushed_epoch(out_dir) is not None


def test_streaming_sink_hook_single_pass(spark, tmp_path):
    """The post-write hook must not re-run the micro-batch plan: an
    accumulator-counting UDF in pre_write fires exactly once per row
    per epoch (the round-2 hook re-ran the plan 3 extra times for
    count/partitions/tail)."""
    from pyspark.sql.types import LongType

    from colcrush.streaming.sink import via_parquet

    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("part")
    )
    df.write.parquet(src_dir)

    acc = spark.sparkContext.accumulator(0)

    @F.udf(LongType())
    def counted(v):
        acc.add(1)
        return v

    seen = {}

    def post(bdf, epoch, state):
        seen["n"] = state.processed_record_count
        seen["parts"] = state.partitions
        seen["last"] = state.last_processed_record

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    q = via_parquet(
        stream, out_dir, ["part"], ck,
        pre_write=lambda d: d.withColumn("c", counted(F.col("id"))),
        post_write=post,
    )
    q.awaitTermination(60)
    assert seen["n"] == 100
    assert seen["parts"] == [("0",), ("1",)]
    assert seen["last"] is not None and "id" in seen["last"]
    assert spark.read.parquet(out_dir).count() == 100
    assert acc.value == 100, f"batch plan ran {acc.value / 100:.0f}x"


def test_read_custom_and_single_file_sink(spark, tmp_path):
    """Custom reader passthrough (ParquetReader.custom parity) and the
    single-file sink (SingleFileParquetSink parity) — round-1 VERDICT
    flagged both as untested."""
    import os

    from colcrush.sources.parquet import read_custom, write_single_file

    # custom format passthrough: json with options
    jdir = str(tmp_path / "j")
    df = spark.range(20).select(F.col("id"), (F.col("id") * 2).alias("v"))
    df.write.json(jdir)
    got = read_custom(spark, "json", jdir, primitivesAsString="false")
    assert got.count() == 20
    assert {r["id"] for r in got.collect()} == set(range(20))

    # single-file sink: exactly one part-file
    sdir = str(tmp_path / "single")
    write_single_file(df, sdir)
    parts = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
    assert len(parts) == 1
    back = spark.read.parquet(sdir)
    assert back.count() == 20
    assert back.exceptAll(df).count() == 0
    # CREATE semantics: second write without overwrite fails
    import pytest as _pytest

    with _pytest.raises(Exception):
        write_single_file(df, sdir)


def test_streaming_sink_null_partition_without_default(spark, tmp_path):
    """A nullable partition column with NO default_partition: rows land
    in the Hive default partition, collect_set surfaces a None part
    value, and the hook's partition sort must not crash on None
    (review finding: tuple comparison raised TypeError)."""
    from colcrush.streaming.sink import via_parquet

    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = spark.range(30).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise((F.col("id") % 2).cast("string"))
        .alias("part"),
    )
    df.write.parquet(src_dir)
    seen = {}

    def post(bdf, epoch, state):
        seen["parts"] = state.partitions

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    q = via_parquet(stream, out_dir, ["part"], ck, post_write=post)
    q.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == 30
    assert (None,) in seen["parts"]
    assert seen["parts"][-1] == (None,)  # None sorts last, others ordered
    assert seen["parts"][:-1] == sorted(seen["parts"][:-1])


def test_streaming_sink_last_record_deterministic(spark, tmp_path):
    """last_processed_record is the batch's FINAL row (tail semantics),
    not an arbitrary partition's last row (review finding: bare
    F.last() in a global aggregate is partial-merge-order-dependent)."""
    from colcrush.streaming.sink import via_parquet

    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("part")
    )
    # one ordered file -> one input partition -> the final row is id=99
    df.orderBy("id").coalesce(1).write.parquet(src_dir)
    seen = {}

    def post(bdf, epoch, state):
        seen["last"] = state.last_processed_record

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    q = via_parquet(stream, out_dir, ["part"], ck, post_write=post)
    q.awaitTermination(60)
    assert seen["last"]["id"] == 99
