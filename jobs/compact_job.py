#!/usr/bin/env python
"""Small-file compaction job — the table-maintenance pass a 100 TB
ingest needs between write-heavy jobs and read-heavy ones:

    zip -r extract_ocr_spark.zip extract_ocr_spark
    spark-submit --py-files extract_ocr_spark.zip jobs/compact_job.py \
        --input <parquet dir> --output <dir> --target-mb 128 \
        [--sort-by col] [--zorder colA,colB]

Streaming micro-batches and per-task writes leave thousands of small
files per partition; every downstream scan then pays one task + one
footer read per file. Compaction rewrites the data into files sized to
``--target-mb``:

- default: round-robin ``repartition(n)`` — evenly-sized files, no sort
  (RoundRobinPartitioning, one shuffle whose width IS the file plan);
- ``--sort-by``: ``repartitionByRange + sortWithinPartitions`` — the
  compacted table gains a total order on the key, so min/max footer
  stats prune range scans (the curate-write lesson: never hash-partition
  a low-cardinality sort key);
- ``--zorder a,b``: Morton-interleave layout via
  ``operators.layout.zorder_write`` — both columns prune at once.

The output file count is PLANNED from the input bytes (Hadoop
ContentSummary — works on any FileSystem, no driver-side file loop),
not guessed: n_out = ceil(bytes_in / target). Parquet-in/parquet-out at
the same codec keeps sizes comparable; a wildly different re-encode
ratio only shifts file sizes, never correctness.

Reference analog: none — the reference writes one file per page
(`/root/reference/src/extract_ocr/crawl.py` export paths) and never
re-organizes; this job exists because Spark-scale tables die by a
thousand small files.
"""

from __future__ import annotations

import argparse
import json
import math


def plan_output_files(bytes_in: int, target_mb: int) -> int:
    """ceil(bytes/target), minimum 1 — the whole planning math, split out
    so the test can pin it against the job's observed output."""
    return max(1, math.ceil(bytes_in / (target_mb * 1024 * 1024)))


def run(spark, input_path: str, output: str, *, target_mb: int = 128,
        sort_by: str | None = None,
        zorder: tuple[str, str] | None = None) -> dict:
    """Compact ``input_path`` (parquet) into ``output`` with files sized
    to ``target_mb``. Returns the stats dict main() prints."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(input_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    summary = fs.getContentSummary(hpath)
    bytes_in = summary.getLength()
    files_in = summary.getFileCount()

    df = spark.read.parquet(input_path)
    n_out = plan_output_files(bytes_in, target_mb)

    if zorder is not None:
        from extract_ocr_spark.operators.layout import zorder_write

        zorder_write(df, zorder, output, n_out)
    elif sort_by is not None:
        (df.repartitionByRange(n_out, sort_by)
           .sortWithinPartitions(sort_by)
           .write.mode("overwrite").parquet(output))
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(output)

    opath = jvm.org.apache.hadoop.fs.Path(output)
    osum = fs.getContentSummary(opath)
    return {
        "files_in": files_in,
        "bytes_in": bytes_in,
        "planned_files": n_out,
        "files_out": sum(
            1 for f in fs.listStatus(opath)
            if f.getPath().getName().endswith(".parquet")),
        "bytes_out": osum.getLength(),
        "layout": ("zorder" if zorder else
                   "range" if sort_by else "roundrobin"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--sort-by", default=None)
    ap.add_argument("--zorder", default=None,
                    help="two comma-separated integer columns for a "
                         "Morton-interleaved layout")
    args = ap.parse_args()
    if args.sort_by and args.zorder:
        ap.error("--sort-by and --zorder are mutually exclusive")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "extract_ocr_spark-compact").getOrCreate()
    stats = run(
        spark, args.input, args.output, target_mb=args.target_mb,
        sort_by=args.sort_by,
        zorder=tuple(args.zorder.split(",")) if args.zorder else None)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
