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
    """Write the requested data-card sections under ``output`` via the
    shared section runner (jobs/_runner.py)."""
    try:
        from jobs._runner import run_sections  # in-process import
    except ImportError:
        from _runner import run_sections  # script/spark-submit path

    return run_sections(spark, input_dir, output, _sections(),
                        "data-card", sections)


def main() -> None:
    try:
        from jobs._runner import run_cli
    except ImportError:
        from _runner import run_cli

    run_cli("extract_ocr_spark-datacard",
            "directory containing documents.parquet", run)


if __name__ == "__main__":
    main()
