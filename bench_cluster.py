#!/usr/bin/env python
"""Multi-executor scaling evidence: local-cluster[N,C,4g], N ∈ {1, 4}.

C (cores per executor) defaults to 8 and is set with
SPARK_GRAFT_CLUSTER_CORES: C=8 is the headline shape (4N lands on all
32 cores, exposed to the box's memory-bus ceiling past ~16 cores);
C=4 keeps 4N = 16 cores inside the machine's linear region, isolating
executor-topology cost. Output: BENCH_CLUSTER.json for C=8,
BENCH_CLUSTER_{C}c.json otherwise.

`bench_scaling.py` evidences the north_rule's N→4N criterion with
local[8]→local[32] — threads inside ONE JVM, where executor-side effects
(serialization between executor JVMs, separate block managers, shuffle
over the ExternalBlockStore path, per-executor Python worker pools) are
invisible. This script runs the same extraction job on Spark's
local-cluster mode: real Worker + Executor JVMs, a real N-vs-4N
*executor* topology — the closest a single box gets to the cluster
shape the rule presumes (the remaining gap: all 4 executors still share
one machine's memory bandwidth and turbo budget, so the Spark-free
machine ceiling from bench_scaling.py applies here too).

Protocol (same discipline as bench_scaling.py):
- one subprocess per topology (fresh JVMs), untimed warm-up first;
- every timed run records its own hypervisor-steal fraction; a run only
  counts when steal < 0.5%; best clean run per level wins;
- efficiency = (docs_per_sec[4×C] / docs_per_sec[1×C]) / 4.

Usage: python bench_cluster.py              # C=8, writes BENCH_CLUSTER.json
       SPARK_GRAFT_CLUSTER_CORES=4 python bench_cluster.py
                                            # C=4, writes BENCH_CLUSTER_4c.json
       python bench_cluster.py --worker N   # internal: one topology
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import STEAL_CLEAN, _stat, _steal_fraction, wait_for_idle

N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "60000"))
EXECUTORS = (1, 4)
# 8 = the headline shape (4N lands on all 32 cores, but the box's memory
# bus saturates past ~16 cores — see BENCH_SCALING.md calibration);
# 4 = the linear-region shape (4N = 16 cores stays inside the region
# where even the Spark-free kernel scales ~linearly), isolating
# executor-topology cost from the machine ceiling.
CORES_PER_EXECUTOR = int(os.environ.get("SPARK_GRAFT_CLUSTER_CORES", "8"))
EXECUTOR_MEM_MB = 4096
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "2"))


def worker(n_executors: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bench import ensure_corpus
    from extract_ocr_spark.pipeline import extract_digest_df

    cores = n_executors * CORES_PER_EXECUTOR
    spark = (
        SparkSession.builder
        .master(f"local-cluster[{n_executors},{CORES_PER_EXECUTOR},"
                f"{EXECUTOR_MEM_MB}]")
        .appName(f"cluster-scaling-{n_executors}x{CORES_PER_EXECUTOR}")
        .config("spark.executorEnv.PYTHONPATH",
                os.path.dirname(os.path.abspath(__file__)))
        .config("spark.sql.shuffle.partitions", str(max(8, cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        # same stall tolerance as session.get_spark — separate executor
        # JVMs are exactly where heartbeat-failure self-exit bites
        .config("spark.executor.heartbeatInterval", "20s")
        .config("spark.network.timeout", "600s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = ensure_corpus(spark)
    docs = spark.read.parquet(corpus)
    parts = 4 * max(8, cores)  # 4 tail-partitions per core (see bench.py)

    def run() -> tuple[float, float, int]:
        s0 = _stat()
        t0 = time.monotonic()
        row = (
            extract_digest_df(docs, partitions=parts)
            .agg(F.sum("bytes_out").alias("b"), F.count("*").alias("docs"))
            .first()
        )
        wall = time.monotonic() - t0
        return wall, _steal_fraction(s0, _stat()), int(row["docs"])

    run()  # warm-up: executor registration, Python worker pools, page cache
    results: list[tuple[float, float]] = []
    clean = 0
    n = 0
    for _ in range(12):
        wait_for_idle()
        wall, steal, n = run()
        results.append((wall, steal))
        if steal < STEAL_CLEAN:
            clean += 1
            if clean >= 4:
                break
    clean_runs = [w for w, s in results if s < STEAL_CLEAN]
    best = min(clean_runs) if clean_runs else min(w for w, _ in results)
    out = {
        "executors": n_executors,
        "cores_per_executor": CORES_PER_EXECUTOR,
        "docs": n,
        "runs_sec_steal": [(round(w, 3), round(s, 4)) for w, s in results],
        "clean_runs": len(clean_runs),
        "best_sec": round(best, 3),
        "docs_per_sec": round(n / best, 1),
    }
    print("WORKER_RESULT " + json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return

    results: dict[int, dict] = {}
    for _round in range(ROUNDS):  # interleave topologies across rounds
        for n in EXECUTORS:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
                capture_output=True, text=True, timeout=2400,
            )
            try:
                line = next(
                    ln for ln in proc.stdout.splitlines()
                    if ln.startswith("WORKER_RESULT "))
            except StopIteration:
                sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
                raise
            res = json.loads(line[len("WORKER_RESULT "):])
            prev = results.get(n)
            if prev is None or res["docs_per_sec"] > prev["docs_per_sec"]:
                res["runs_sec_steal"] = (
                    (prev["runs_sec_steal"] if prev else [])
                    + res["runs_sec_steal"])
                res["clean_runs"] += prev["clean_runs"] if prev else 0
                results[n] = res
            else:
                prev["runs_sec_steal"] += res["runs_sec_steal"]
                prev["clean_runs"] += res["clean_runs"]

    tp = {n: results[n]["docs_per_sec"] for n in EXECUTORS}
    eff = round((tp[4] / tp[1]) / 4.0, 3)
    c = CORES_PER_EXECUTOR
    summary = {
        "metric": "executor_scaling_efficiency_N_to_4N",
        "value": eff,
        "unit": "ratio",
        "protocol": (
            f"local-cluster[1,{c},4g] vs local-cluster[4,{c},4g] — "
            f"separate executor JVMs, efficiency = (T_4x{c}/T_1x{c})/4, "
            "steal-gated"),
        "docs": results[1]["docs"],
        "cores_per_executor": c,
        "levels": {str(n): results[n] for n in EXECUTORS},
        f"efficiency_1x{c}_to_4x{c}": eff,
        "criterion": "north_rule: >= 0.8 from N to 4N executors",
    }
    print(json.dumps(summary))

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_CLUSTER.json" if c == 8 else f"BENCH_CLUSTER_{c}c.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
