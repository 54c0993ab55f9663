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

import argparse
import json
import time


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
    """Write the requested eval sections under ``output`` and return
    the stats dict main() prints. Unknown names fail fast before any
    Spark work; an explicitly empty selection is a caller bug."""
    table = _sections()
    names = list(table) if sections is None else sections
    if not names:
        raise ValueError("no eval sections requested")
    unknown = [n for n in names if n not in table]
    if unknown:
        raise ValueError(
            f"unknown eval sections {unknown}; known: {list(table)}")
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
                    help="directory with documents.parquet + "
                         "embeddings.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--sections", default=None,
                    help="comma-separated subset (default: all)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "extract_ocr_spark-eval").getOrCreate()
    stats = run(
        spark, args.input, args.output,
        sections=[s.strip() for s in args.sections.split(",") if s.strip()]
        if args.sections is not None else None)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
