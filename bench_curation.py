#!/usr/bin/env python
"""Curation-layer headline benchmark: times jobs/curate_job.run — the
composed dedup → quality → repetition gate → decontamination → split →
pack pipeline — end-to-end at the bench scale factor, writing the real
partitioned output each attempt (the write is part of the pipeline).

Timed configurations (the default list keeps the four historical rows
comparable across rounds; "para" is opt-in via the env) so the
expensive optional stages carry wall numbers, not just correctness
tests:
  default    — exact dedup + quality + repetition + decontamination
  fuzzy      — + --fuzzy-dedup (MinHash LSH + connected components,
               the costliest stage in the job)
  fuzzy_lm   — + --max-lm-nll (corpus bigram LM gate) on top of fuzzy
  full       — + --min-classifier-score (hashed linear classifier) on
               top of fuzzy_lm — every optional gate on at once
  para       — + --paragraph-dedup alone (sub-document rewrite; the
               paragraph-sha shuffle is what this row isolates)
  dsir       — + --min-dsir-logratio=-100 alone (hashed-ngram explode +
               distribution rollup; non-selective so downstream stage
               sizes stay comparable to "default")

Prints ONE JSON line mirroring bench.py's format; timing discipline is
shared with bench.py (min-of-N, per-run [wall, steal, foreign_busy,
idle_ok] tuples, clean = steal < 0.5% AND foreign busy < 2%).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_CURATION_STAGES (comma list, default
         "default,fuzzy,fuzzy_lm,full"),
     SPARK_GRAFT_CURATION_DOCS (default 0 = use SF_DIR documents;
         set e.g. 1200000 for the endurance corpus — generated natively,
         cached under .bench_data/, default stages then just "default",
         and the JVM peak RSS is recorded like bench_endurance.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BUSY_CLEAN, timed  # noqa: E402
from bench_endurance import _jvm_peak_rss_kib  # noqa: E402
from bench_scaling import STEAL_CLEAN  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_CURATION_DOCS", "0"))
STAGES = [s.strip() for s in os.environ.get(
    "SPARK_GRAFT_CURATION_STAGES",
    "default" if N_DOCS else "default,fuzzy,fuzzy_lm,full").split(",")
    if s.strip()]

# measured on the sf0.1 corpus: typical docs score ~4-6 avg_nll under the
# self-trained bigram LM; 8.0 exercises the full gate cost while dropping
# only genuine outliers
LM_NLL_GATE = 8.0

# measured on the sf0.1 corpus: classifier scores center at ~0.01 with
# std ~0.105, so -0.2 (< 2.5th percentile) pays the full gate cost while
# dropping only genuine outliers
CLF_GATE = -0.2

_KW = {
    "default": {},
    "fuzzy": {"fuzzy_dedup": True},
    "fuzzy_lm": {"fuzzy_dedup": True, "max_lm_nll": LM_NLL_GATE},
    "full": {"fuzzy_dedup": True, "max_lm_nll": LM_NLL_GATE,
             "min_classifier_score": CLF_GATE},
    # the sub-document rewrite stage alone over the default gates — the
    # para shuffle cost is what the wall number isolates
    "para": {"paragraph_dedup": True},
    # the DSIR gate alone over the default gates — the hashed-ngram
    # explode + distribution rollup is its whole cost. -100 keeps the
    # gate from dropping rows (cost, not selectivity). The gopher gate
    # has no stage: it is a map-only flag (near-free), and the synthetic
    # word-soup corpus fails its stopword rule wholesale, which would
    # empty every downstream stage and fake their costs.
    "dsir": {"min_dsir_logratio": -100.0},
}

_UNKNOWN = sorted(set(STAGES) - set(_KW))
if _UNKNOWN or not STAGES:
    sys.exit(f"SPARK_GRAFT_CURATION_STAGES must name at least one of "
             f"{sorted(_KW)}" + (f"; unknown: {_UNKNOWN}" if _UNKNOWN else ""))


def main() -> None:
    from extract_ocr_spark.session import get_spark
    from jobs.curate_job import run

    spark = get_spark(f"local[{CPUS}]", app_name="bench-curation",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    if N_DOCS:
        from extract_ocr_spark.datagen import synthetic_flat_documents_df

        corpus_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".bench_data",
            f"flatdocs_{N_DOCS}")
        if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
            synthetic_flat_documents_df(spark, N_DOCS, partitions=256) \
                .write.mode("overwrite").parquet(corpus_dir)
        docs = spark.read.parquet(corpus_dir)
    else:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()

    workdir = tempfile.mkdtemp(prefix="bench_curation_")
    queries: dict[str, float] = {}
    all_runs: dict[str, list] = {}
    all_stats: dict[str, dict] = {}

    def one_pass(kw: dict, stats: dict) -> None:
        out = os.path.join(workdir, "out")
        shutil.rmtree(out, ignore_errors=True)
        stats.update(run(spark, docs, out, **kw))

    # untimed warm-up with the UNION of all requested stage configs, so
    # every stage-specific code path (MinHash/CC, LM gate) is JIT-warm
    # before its first timed attempt — not just the first stage's paths
    warm_kw: dict = {}
    for s in STAGES:
        warm_kw.update(_KW[s])
    one_pass(warm_kw, {})
    attempts = 2 if N_DOCS else 3
    for stage in STAGES:
        stats: dict = {}
        best, runs = timed(lambda: one_pass(_KW[stage], stats),
                           attempts=attempts, extra_if_dirty=1)
        queries[f"curate_{stage}"] = round(best, 3)
        all_runs[f"curate_{stage}"] = runs
        all_stats[stage] = stats
    shutil.rmtree(workdir, ignore_errors=True)

    sf: object = 0.1
    if N_DOCS:
        sf = "endurance"
    elif "sf0.01" in SF_DIR:
        sf = 0.01
    elif "sf0.001" in SF_DIR:
        sf = 0.001
    headline = queries[f"curate_{STAGES[0]}"]
    out: dict = {
        "metric": "curation_pipeline_wall_sec",
        "value": headline,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "docs_in": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
        "stats": all_stats,
        "runs_sec_steal": all_runs,
        "steal_clean_threshold": STEAL_CLEAN,
        "busy_clean_threshold": BUSY_CLEAN,
        "cpus": CPUS,
    }
    if N_DOCS:
        out["jvm_peak_rss_gib"] = round(
            _jvm_peak_rss_kib(os.getpid()) / 2**20, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
