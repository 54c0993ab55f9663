#!/usr/bin/env python
"""Data-card job — publishes the corpus governance report a training
run ships alongside a curated dataset, in one spark-submit:

    zip -r extract_ocr_spark.zip extract_ocr_spark
    spark-submit --py-files extract_ocr_spark.zip jobs/datacard_job.py \
        --input <dir with documents.parquet> --output <dir> \
        [--sections corpus,cube,chi2]

Each section is written as its own parquet table under
``<output>/<section>/``:

- ``corpus``        per-source volumes, exact-dup counts, language mix
                    (curation.corpus_report)
- ``cube``          doc/token volumes at every (source, lang)
                    granularity via CUBE (curation.cube_report)
- ``length_exact``  exact per-source token-count p50/p90/p99
                    (curation.length_quantiles)
- ``length_sketch`` the mergeable HDR quantile bounds
                    (curation.hdr_quantiles)
- ``chi2``          per-source chi-squared composition drift
                    (textanalysis.chi2_drift)
- ``ks``            per-source KS classifier-score drift
                    (textanalysis.ks_drift)
- ``mixture``       temperature resampling weights
                    (curation.mixture_weights)

The sections ARE the registry queries — called verbatim, never
re-implemented — so every number on the published card is covered by
the same DuckDB oracles and two-scale guards as the query surface; the
card cannot drift from what the tests verify.

Scale: sections run as independent actions over the one input table;
each scan is column-pruned to what its section needs (the parquet
reader never hauls `text` for the contingency sections), and every
section's own shuffle discipline is documented at its operator. A
section failure aborts the job before any summary is printed — a
partially-written card directory is never reported as published.

Reference analog: none — the reference's closest artifact is the
per-run summary JSON (/root/reference/src/extract_ocr/crawl.py export
paths); this job exists because shipping a corpus at 10^12 docs
requires the governance numbers, not just run counters.
"""

from __future__ import annotations

import argparse
import json
import time


def _sections() -> dict:
    from extract_ocr_spark.operators import curation, textanalysis

    return {
        "corpus": curation.corpus_report,
        "cube": curation.cube_report,
        "length_exact": curation.length_quantiles,
        "length_sketch": curation.hdr_quantiles,
        "chi2": textanalysis.chi2_drift,
        "ks": textanalysis.ks_drift,
        "mixture": curation.mixture_weights,
    }


def run(spark, input_dir: str, output: str,
        sections: list[str] | None = None) -> dict:
    """Write the requested data-card sections under ``output`` and
    return the stats dict main() prints. Unknown section names fail
    fast before any Spark work (the bench_curation lesson)."""
    table = _sections()
    # None means "all"; an explicitly empty selection is a caller bug
    # (an unset $SECTIONS variable must not silently publish everything)
    names = list(table) if sections is None else sections
    if not names:
        raise ValueError("no data-card sections requested")
    unknown = [n for n in names if n not in table]
    if unknown:
        raise ValueError(
            f"unknown data-card sections {unknown}; known: {list(table)}")
    stats: dict = {"sections": {}, "output": output}
    for name in names:
        t0 = time.monotonic()
        df = table[name](spark, input_dir)
        path = f"{output}/{name}"
        df.write.mode("overwrite").parquet(path)
        stats["sections"][name] = {
            "rows": spark.read.parquet(path).count(),
            "wall_sec": round(time.monotonic() - t0, 3),
        }
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--sections", default=None,
                    help="comma-separated subset (default: all)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "extract_ocr_spark-datacard").getOrCreate()
    stats = run(
        spark, args.input, args.output,
        sections=[s.strip() for s in args.sections.split(",") if s.strip()]
        if args.sections is not None else None)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
