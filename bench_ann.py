#!/usr/bin/env python
"""ANN serving benchmark: the build-once/serve-many claim behind
jobs/ann_index_job.py, measured — inline IVF-PQ query (re-encodes the
corpus per query) vs one index build + queries served from the
materialized cell-partitioned code table.

The corpus is natively generated (pure codegen, no Python row funcs):
SPARK_GRAFT_ANN_VECS vectors (default 1M), 64-dim doubles in [-1, 1)
from xxhash64(vec_id*64+dim), written once as <dir>/embeddings.parquet
so the registry's own `ann_topk_ivfpq(spark, sf_dir)` runs on it
unchanged as the inline baseline.

Prints ONE JSON line in bench.py's format; timing discipline shared
with bench.py (min-of-N, [wall, steal, foreign_busy, idle_ok] tuples).

Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_ANN_VECS (default
     1_000_000), SPARK_GRAFT_ANN_DIR (default /tmp/spark_graft_ann).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "jobs"))

from bench import timed  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_VECS = int(os.environ.get("SPARK_GRAFT_ANN_VECS", "1000000"))
BASE = os.environ.get("SPARK_GRAFT_ANN_DIR", "/tmp/spark_graft_ann")


def ensure_corpus(spark) -> str:
    """64-dim embeddings table shaped exactly like the testdata one
    (vec_id, embedding array<double>, label), closed-form values."""
    from pyspark.sql import functions as F

    sf_dir = os.path.join(BASE, f"corpus_{N_VECS}")
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        dims = F.sequence(F.lit(0), F.lit(63))
        emb = F.transform(
            dims,
            lambda d: F.pmod(F.xxhash64(F.col("vec_id") * 64 + d),
                             F.lit(1000)).cast("double") / 500.0 - 1.0)
        (spark.range(0, N_VECS, 1, 4 * CPUS)
         .select(F.col("id").alias("vec_id"),
                 emb.alias("embedding"),
                 F.pmod(F.col("id"), F.lit(7)).cast("int").alias("label"))
         .write.mode("overwrite").parquet(path))
    return sf_dir


def main() -> None:
    from ann_index_job import build, query

    from extract_ocr_spark.operators.similarity import ann_topk_ivfpq
    from extract_ocr_spark.session import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name="bench-ann",
                      shuffle_partitions=CPUS)
    sf_dir = ensure_corpus(spark)
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    idx = os.path.join(BASE, f"index_{N_VECS}")

    results: dict[str, float] = {}
    tuples: dict[str, list] = {}

    # inline: the oracle-checked one-shot (codebook collect + re-encode
    # the full corpus + ADC + top-k, per query)
    w, runs = timed(lambda: ann_topk_ivfpq(spark, sf_dir).collect())
    results["inline_ivfpq_query"], tuples["inline_ivfpq_query"] = w, runs

    # build: one map-only encode pass + cell-partitioned write (done
    # once, amortized over every query that follows). Each attempt
    # writes a FRESH directory — deleting the prior attempt's full code
    # table inside the timed region would bill filesystem cleanup to
    # the build (and make run 1 measure a different op than runs 2+).
    attempt = [0]

    def _build():
        attempt[0] += 1
        build(spark, emb_path, f"{idx}.tmp{attempt[0]}")

    w, runs = timed(_build)
    # last attempt becomes the served index (rename, not rebuild)
    shutil.rmtree(idx, ignore_errors=True)
    os.rename(f"{idx}.tmp{attempt[0]}", idx)
    for i in range(1, attempt[0]):
        shutil.rmtree(f"{idx}.tmp{i}", ignore_errors=True)
    results["index_build"], tuples["index_build"] = w, runs

    # served: probe 2/16 cells of the materialized code table
    # (partition pruning on disk; 4 BIGINT codes per candidate)
    w, runs = timed(lambda: query(spark, emb_path, idx).collect())
    results["index_query"], tuples["index_query"] = w, runs

    speedup = results["inline_ivfpq_query"] / results["index_query"]
    saved = results["inline_ivfpq_query"] - results["index_query"]
    # None = serving never beats inline at this scale (fixed job
    # overhead dominates), the honest answer for tiny corpora
    breakeven = results["index_build"] / saved if saved > 0 else None
    print(json.dumps({
        "metric": "ann_serving_wall_sec",
        "value": round(results["index_query"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in results.items()},
        "n_vectors": N_VECS,
        "serve_speedup_vs_inline": round(speedup, 1),
        "build_breakeven_queries":
            None if breakeven is None else round(breakeven, 1),
        "runs_sec_steal": tuples,
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
