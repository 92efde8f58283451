"""spark-submit entry point: encode a source-code table into a
resumable colcrush dataset (the north_rule deployment shape).

    zip -r colcrush.zip colcrush
    spark-submit --master local[8] --py-files colcrush.zip \
        scripts/encode_job.py --input <parquet dir or SYNTH:rows> \
        --output /path/ds --group-cols repo,lang [--resume]

On a cluster, swap --master for yarn/k8s and size --num-executors; the
job itself is unchanged (the engine plans partitioning from data size,
not from the master URL).
"""

from __future__ import annotations

import argparse
import json
import time

import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir, or SYNTH:<rows>")
    ap.add_argument("--output", required=True)
    ap.add_argument("--group-cols", default="repo,lang")
    ap.add_argument("--profile", default="balanced")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--mode", default="error")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("colcrush-encode").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imported after session start so --py-files zips resolve on executors
    from colcrush.engine import read_manifest, resume_encode, write_encoded
    from colcrush.fixtures import source_code_df

    if args.input.startswith("SYNTH:"):
        df = source_code_df(spark, int(args.input.split(":", 1)[1]))
    else:
        df = spark.read.parquet(args.input)
    group_cols = [c for c in args.group_cols.split(",") if c]

    t0 = time.time()
    if args.resume:
        missing = resume_encode(df, args.output, group_cols=group_cols, profile=args.profile)
        action = f"resumed ({missing} groups encoded)"
    else:
        write_encoded(df, args.output, mode=args.mode, group_cols=group_cols, profile=args.profile)
        action = "encoded"
    wall = time.time() - t0

    m = read_manifest(spark, args.output)
    stats = m.agg(
        F.sum(F.when(F.col("column") == m.select("column").first()[0], F.col("n_rows"))).alias("_"),
        F.sum("enc_bytes").alias("enc_bytes"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.countDistinct("chunk_id").alias("chunks"),
    ).collect()[0]
    print(json.dumps({
        "action": action,
        "wall_sec": round(wall, 2),
        "chunks": stats["chunks"],
        "encoded_bytes": int(stats["enc_bytes"]),
        "raw_bytes": int(stats["raw_bytes"]),
        "ratio": round(stats["enc_bytes"] / max(1, stats["raw_bytes"]), 4),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
