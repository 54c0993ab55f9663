#!/usr/bin/env python
"""Cluster training-data curation job — extracted corpus → training-ready
splits, composing the curation operators end-to-end:

    zip -r extract_ocr_spark.zip extract_ocr_spark
    spark-submit --py-files extract_ocr_spark.zip jobs/curate_job.py \
        --input  <documents(doc_id, text, ...) path or table> \
        --output <dir> [--eval-ids 0,1,2,3,4]

Stages (each one shuffle or less; see operators/curation.py scale notes):

1. exact dedup (normalized-content hash, canonical min-doc_id row)
2. quality filter (length / alpha / punct / word-length gates)
3. benchmark decontamination (inverted shingle index vs the eval set)
4. deterministic 90/5/5 split assignment (content-hash buckets, no RNG)
5. reproducible training shuffle key (salted hash)
6. write partitioned by split, sorted within partitions by shuffle key

Output: ``<out>/corpus`` (partitioned by split) + ``<out>/stats.json``.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--eval-ids", default="0,1,2,3,4",
                    help="doc_ids forming the decontamination eval set")
    ap.add_argument("--min-shared-shingles", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from extract_ocr_spark.operators.curation import (
        dedup_apply_df,
        quality_filter_df,
        split_assign_df,
    )
    from extract_ocr_spark.operators.dedup import _with_shingles

    spark = SparkSession.builder.appName("extract_ocr_spark-curate").getOrCreate()
    docs = (
        spark.read.table(args.input)
        if "." in args.input and "/" not in args.input
        else spark.read.parquet(args.input)
    )
    n_in = docs.count()

    # 1-2: dedup then quality gates
    deduped = dedup_apply_df(docs)
    gated = quality_filter_df(deduped).filter("keep") \
        .drop("ok_len", "ok_alpha", "ok_punct", "ok_words", "keep")

    # 3: decontamination — drop docs sharing >= K distinct shingles with
    # the eval set (inverted index; never a cross join)
    eval_ids = [int(x) for x in args.eval_ids.split(",") if x != ""]
    sh = _with_shingles(gated).select(
        "doc_id", F.explode("shingles").alias("shingle"))
    eval_sh = sh.filter(F.col("doc_id").isin(eval_ids)) \
                .select("shingle").distinct()
    contaminated = (
        sh.filter(~F.col("doc_id").isin(eval_ids))
        .join(eval_sh, "shingle")
        .groupBy("doc_id").agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= args.min_shared_shingles)
        .select("doc_id")
    )
    clean = gated.join(contaminated, "doc_id", "left_anti") \
                 .filter(~F.col("doc_id").isin(eval_ids))

    # 4-5: splits + reproducible shuffle key
    final = split_assign_df(clean).withColumn(
        "shuffle_key",
        F.sha2(F.concat(F.lit("epoch-1:"), F.col("doc_id").cast("string")), 256),
    )

    # 6: write — partition by split, sort within partitions by shuffle key
    (final.repartition("split")
     .sortWithinPartitions("shuffle_key")
     .write.mode("overwrite").partitionBy("split")
     .parquet(f"{args.output}/corpus"))

    # Stats from the final frame, not a read-back: a fully-filtered corpus
    # writes no parquet files and a bare read would fail schema inference.
    by_split = {r["split"]: r["n"] for r in
                final.groupBy("split").agg(F.count("*").alias("n")).collect()}
    stats = {
        "docs_in": n_in,
        "after_dedup": deduped.count(),
        "after_quality": gated.count(),
        "contaminated_dropped": contaminated.count(),
        "docs_out": sum(by_split.values()),
        "by_split": by_split,
    }
    with open(f"{args.output}/stats.json", "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
