#!/usr/bin/env python
"""Model-eval job — publishes the evaluation panel a curation run ships
alongside its trained gates (classifier quality, retrieval quality) in
one spark-submit:

    zip -r extract_ocr_spark.zip extract_ocr_spark
    spark-submit --py-files extract_ocr_spark.zip jobs/eval_job.py \
        --input <dir with documents.parquet + embeddings.parquet> \
        --output <dir> [--sections auc,mrr]

Each section is written as its own parquet table under
``<output>/<section>/``:

- ``auc``          per-source exact ROC-AUC of the quality classifier
                   (textanalysis.classifier_auc)
- ``pr``           precision/recall at 21 thresholds
                   (textanalysis.pr_curve)
- ``calibration``  reliability diagram bins
                   (textanalysis.calibration_bins)
- ``confusion``    trained-NB language confusion matrix
                   (textanalysis.nb_lang_confusion)
- ``ndcg``         NDCG@10 of the LSH ANN ranking
                   (similarity.ndcg_eval)
- ``mrr``          reciprocal rank of the true nearest neighbor
                   (similarity.mrr_eval)
- ``rrf``          hybrid BM25+vector fusion top-10
                   (similarity.rrf_fusion)

The sections ARE the registry queries — called verbatim, never
re-implemented (the datacard_job discipline) — so every number on the
published panel is covered by the same DuckDB oracles and two-scale
guards as the query surface. The classifier sections share ONE
operating-point space (`_qc_scored`/`_qc_hist`); the retrieval
sections share ONE candidate rule (`_lsh_eval_frames`); a section
failure aborts before the summary prints.

Reference analog: none — the reference has no trained components to
evaluate; this job exists because curation gates and ANN serving at
10^12 docs need their quality measured on every corpus refresh.
"""

from __future__ import annotations


def _sections() -> dict:
    from extract_ocr_spark.operators import similarity, textanalysis

    return {
        "auc": textanalysis.classifier_auc,
        "pr": textanalysis.pr_curve,
        "calibration": textanalysis.calibration_bins,
        "confusion": textanalysis.nb_lang_confusion,
        "ndcg": similarity.ndcg_eval,
        "mrr": similarity.mrr_eval,
        "rrf": similarity.rrf_fusion,
    }


def run(spark, input_dir: str, output: str,
        sections: list[str] | None = None) -> dict:
    """Write the requested eval sections under ``output`` via the
    shared section runner (jobs/_runner.py)."""
    try:
        from jobs._runner import run_sections  # in-process import
    except ImportError:
        from _runner import run_sections  # script/spark-submit path

    return run_sections(spark, input_dir, output, _sections(), "eval",
                        sections)


def main() -> None:
    try:
        from jobs._runner import run_cli
    except ImportError:
        from _runner import run_cli

    run_cli("extract_ocr_spark-eval",
            "directory with documents.parquet + embeddings.parquet", run)


if __name__ == "__main__":
    main()
