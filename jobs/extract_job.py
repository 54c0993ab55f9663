#!/usr/bin/env python
"""Cluster extraction job — the `spark-submit --py-files` entry point.

    zip -r extract_ocr_spark.zip extract_ocr_spark
    spark-submit --py-files extract_ocr_spark.zip jobs/extract_job.py \
        --input  <path or table of documents(doc_id, spans)> \
        --output <output dir> [--micro-batches 16] [--resume]

On a cluster the input would be `spark.read.table("catalog.db.documents")`
(Iceberg) and the three appends one multi-table transaction; the parquet
path below is the environment-portable fallback with identical semantics.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--micro-batches", type=int, default=1)
    ap.add_argument("--mode", default="reference", choices=["reference", "density"])
    ap.add_argument("--force", action="store_true",
                help="re-derive all documents regardless of lineage (normalize-export semantics)")
    ap.add_argument("--audit", action="store_true",
                    help="run the lineage completeness audit after extraction")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from extract_ocr_spark.lineage_audit import audit_run
    from extract_ocr_spark.pipeline import ExtractionRun

    spark = SparkSession.builder.appName("extract_ocr_spark").getOrCreate()
    docs = (
        spark.read.table(args.input) if "." in args.input and "/" not in args.input
        else spark.read.parquet(args.input)
    )

    run = ExtractionRun(spark, args.output, mode=args.mode)
    stats = run.run(docs, micro_batches=args.micro_batches, force=args.force)
    print(json.dumps(stats))

    if args.audit:
        lineage = run.lineage()  # committed batches only
        report = audit_run(docs, lineage, run.extracted())
        print(json.dumps(report))
        if not report["ok"]:
            sys.exit(4)  # reference inspect-export exit code


if __name__ == "__main__":
    main()
