#!/usr/bin/env python
"""Local-seed ingest job — the reference's EP2 workflow
(`extract_ocr uspto-data --seed-html-dir DIR --out DIR`) as a
spark-submit pipeline:

    zip -r extract_ocr_spark.zip extract_ocr_spark
    spark-submit --py-files extract_ocr_spark.zip jobs/ingest_job.py \
        --seed-html-dir <dir of browser-saved *.html> \
        --output <dir> [--micro-batches 4] [--audit]

Mirrors the reference semantics: ``*_files`` asset dirs skipped, original
URL recovered from the "saved from url=" comment, WAF screening with the
anchor-count integration heuristic DISABLED (cli.py:473-483 — only hard
block markers drop a local seed), checkpointed extraction with lineage +
metrics, optional completeness audit (= ``--validate``, exit 4 on
missing, cli.py:343-351).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed-html-dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--micro-batches", type=int, default=1)
    ap.add_argument("--mode", default="reference",
                    choices=["reference", "density"])
    ap.add_argument("--audit", action="store_true",
                    help="completeness audit after ingest (exit 4 on missing)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from extract_ocr_spark.lineage_audit import audit_run
    from extract_ocr_spark.pipeline import ExtractionRun
    from extract_ocr_spark.sources import ingest_local_html

    spark = SparkSession.builder.appName("extract_ocr_spark-ingest").getOrCreate()
    docs = ingest_local_html(spark, args.seed_html_dir)

    # local-seed WAF semantics: anchor-count integration heuristic off
    run = ExtractionRun(spark, args.output, mode=args.mode,
                        waf_integration=False)
    stats = run.run(docs, micro_batches=args.micro_batches)
    print(json.dumps(stats))

    if args.audit:
        lineage = run.lineage()  # committed batches only
        report = audit_run(docs, lineage, run.extracted())
        print(json.dumps(report))
        if not report["ok"]:
            spark.stop()
            sys.exit(4)  # reference --validate exit code (cli.py:343-351)
    spark.stop()


if __name__ == "__main__":
    main()
