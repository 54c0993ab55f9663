#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries:
- extract_synthetic: the flagship — distributed span extraction (HTML →
  markdown, PDF layout, OCR, JSON/XML) over a deterministic synthetic
  interleaved-spans corpus (skewed size distribution included). The corpus
  is materialized to parquet once and reused, so the timing is extraction,
  not generation.
- extract_flat: extraction over the sf documents table wrapped as spans.
- pricing_summary / minhash_lsh_pairs / ann_topk: relational, dedup, and
  similarity headliners at the bench scale factor.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_DOCS (default 60000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 120k docs ≈ 1 GB corpus: long enough for stable timing on 32 cores,
# small enough to regenerate in seconds.
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "120000"))
# v3: 128 output files so every parallelism level (8/16/32) runs ≥4 waves
# of small-doc tasks — at 32 cores a 32-file corpus is a single wave and
# wave-quantization (the last straggler) dominates the wall clock.
CORPUS_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_data",
    f"spans_v3_{N_DOCS}")


# One shared definition of steal gating for all three benches (bench.py,
# bench_scaling.py, bench_cluster.py): every timed run records its own
# /proc/stat col-8 steal fraction, so a recorded number is self-defending
# — a reader can tell a measurement from a steal artifact without
# re-running. (This box is a VM; identical runs vary 3-5× under
# neighbor-VM steal.)
from bench_scaling import STEAL_CLEAN, _stat, _steal_fraction  # noqa: E402


# A run is clean only when BOTH hold: hypervisor steal < STEAL_CLEAN AND
# foreign busy < BUSY_CLEAN. Foreign busy = (box busy CPU − this process
# tree's CPU) / box total — same-VM contention shows up as busy CPU with
# zero steal, which the r3 gate was blind to (a "clean" pricing_summary
# recorded 17 s that re-measured at 0.9 s).
BUSY_CLEAN = 0.02


def _proc_tree_ticks(root: int) -> int:
    """Total utime+stime+cutime+cstime (USER_HZ ticks) of ``root`` and all
    its live descendants — the local-mode JVM and Python workers are
    children of this driver, so the delta over a timed run is *our* CPU;
    anything above it in /proc/stat is a neighbor process."""
    import glob

    procs: dict[int, tuple[int, int]] = {}
    for path in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(path) as f:
                data = f.read()
            rest = data.rsplit(")", 1)[1].split()
            # after comm: state ppid ... utime(11) stime(12) cutime(13)
            # cstime(14)
            procs[int(path.split("/")[2])] = (
                int(rest[1]), sum(int(rest[i]) for i in (11, 12, 13, 14)))
        except (OSError, IndexError, ValueError):
            continue  # process exited mid-scan / truncated stat line
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    total, stack = 0, [root]
    while stack:
        p = stack.pop()
        if p in procs:
            total += procs[p][1]
        stack.extend(children.get(p, []))
    return total


# Total idle-wait budget across the WHOLE bench process: on a busy box,
# 15 timed runs × 60 s per-run waits would add 15 minutes before a single
# measurement — past this budget runs start immediately (flagged dirty in
# their tuple) so the bench always terminates promptly.
_IDLE_WAIT_BUDGET_S = 180.0
_idle_wait_spent = 0.0


def wait_for_idle(threshold: float = 0.15, timeout_s: float = 60.0) -> bool:
    """Gate timed runs on host idleness AND low hypervisor steal: this
    sandbox shares the box with external load spikes; timings must
    measure uncontended capability. Returns False when the wait timed
    out or the process-wide wait budget is exhausted (the run proceeds
    but is flagged dirty in the record)."""
    global _idle_wait_spent

    def busy_and_steal(interval: float = 0.5) -> tuple[float, float]:
        s0 = _stat()
        time.sleep(interval)
        s1 = _stat()
        idle = (s1[3] + s1[4]) - (s0[3] + s0[4])
        return 1.0 - idle / max(1, sum(s1) - sum(s0)), _steal_fraction(s0, s1)

    t0 = time.monotonic()
    deadline = t0 + min(timeout_s, _IDLE_WAIT_BUDGET_S - _idle_wait_spent)
    ok = False
    while time.monotonic() < deadline:
        b, s = busy_and_steal()
        if b < threshold and s < STEAL_CLEAN:
            ok = True
            break
        time.sleep(2.0)
    _idle_wait_spent += time.monotonic() - t0
    return ok


def timed(fn, attempts: int = 3, extra_if_dirty: int = 2):
    """Run ``fn`` ``attempts`` (+``extra_if_dirty`` when no clean sample
    appeared) times; return (best_clean_or_overall_wall, runs) where each
    run is [wall_sec, steal_frac, foreign_busy_frac, idle_wait_ok].
    Contaminated attempts are recorded but never beat a clean one, so
    every recorded number is self-defending: a reader can tell a
    measurement from a contention artifact without re-running."""
    me = os.getpid()
    runs: list[list] = []
    budget = attempts
    while budget > 0:
        idle_ok = wait_for_idle()
        s0, k0 = _stat(), _proc_tree_ticks(me)
        t0 = time.monotonic()
        fn()
        wall = time.monotonic() - t0
        s1, k1 = _stat(), _proc_tree_ticks(me)
        total = max(1, sum(s1) - sum(s0))
        # busy excludes idle+iowait AND steal (steal has its own column in
        # the record; without the exclusion every stolen tick would be
        # double-flagged as foreign-busy too)
        busy = total - ((s1[3] + s1[4]) - (s0[3] + s0[4])) - (s1[7] - s0[7])
        foreign = max(0, busy - (k1 - k0)) / total
        runs.append([round(wall, 3), round(_steal_fraction(s0, s1), 4),
                     round(foreign, 4), int(idle_ok)])
        budget -= 1
        if budget == 0 and extra_if_dirty > 0 and not any(
                s < STEAL_CLEAN and b < BUSY_CLEAN for _, s, b, _ok in runs):
            budget, extra_if_dirty = extra_if_dirty, 0
    clean = [w for w, s, b, _ok in runs
             if s < STEAL_CLEAN and b < BUSY_CLEAN]
    return (min(clean) if clean else min(w for w, *_ in runs)), runs


def ensure_corpus(spark) -> str:
    marker = os.path.join(CORPUS_DIR, "_SUCCESS")
    if not os.path.exists(marker):
        from extract_ocr_spark.datagen import synthetic_documents_df

        synthetic_documents_df(spark, N_DOCS, seed=42, partitions=128) \
            .write.mode("overwrite").parquet(CORPUS_DIR)
    return CORPUS_DIR


def force_extraction(out_df) -> int:
    """Materialize the extraction: every output byte is produced (the
    digest path hashes all rendered text, so nothing can be skipped); the
    reduce is a cheap long-sum. The digest return channel ships ~64 B/doc
    instead of the full rendered text — an aggregate consumer never needs
    the bytes, and shipping them Python→JVM was the measured memory-bus
    bottleneck of the r1 bench (BENCH.md analysis)."""
    row = out_df.agg(
        F.sum("bytes_out").alias("chars"), F.count("*").alias("docs")
    ).first()
    return int(row["docs"])


def main() -> None:
    from extract_ocr_spark.datagen import spans_from_flat_documents
    from extract_ocr_spark.operators.dedup import minhash_lsh_pairs
    from extract_ocr_spark.operators.relational import pricing_summary
    from extract_ocr_spark.operators.similarity import ann_topk
    from extract_ocr_spark.pipeline import extract_digest_df
    from extract_ocr_spark.session import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name="bench",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    corpus = ensure_corpus(spark)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # 1. flagship: synthetic spans extraction.
    # One untimed warm-up pass (JIT, Python-worker pool spawn, page cache —
    # none of which exist on a long-running cluster), then median of 3.
    # 4 tail-partitions per core: the oversized-doc tasks are the slowest,
    # so finer granularity lets the scheduler pack them without stragglers.
    parts = 4 * max(8, CPUS)
    docs = spark.read.parquet(corpus)
    n = force_extraction(extract_digest_df(docs, partitions=parts))
    steals: dict[str, list] = {}
    best, runs = timed(
        lambda: force_extraction(extract_digest_df(docs, partitions=parts)))
    timings["extract_synthetic"] = round(best, 3)
    steals["extract_synthetic"] = runs
    extras["extraction_docs_per_sec"] = round(n / timings["extract_synthetic"], 1)
    extras["extraction_docs"] = n

    # 2. extraction over the driver's flat documents table
    flat = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    best, runs = timed(
        lambda: force_extraction(extract_digest_df(
            spans_from_flat_documents(flat), partitions=parts)))
    timings["extract_flat"] = round(best, 3)
    steals["extract_flat"] = runs

    # 3. relational headliner
    best, runs = timed(lambda: pricing_summary(spark, SF_DIR).collect())
    timings["pricing_summary"] = round(best, 3)
    steals["pricing_summary"] = runs

    # 4. dedup headliner (MinHash + LSH + exact verify); untimed warm-up
    # first — steady-state, consistent with the extraction measurement.
    minhash_lsh_pairs(spark, SF_DIR).collect()
    best, runs = timed(lambda: minhash_lsh_pairs(spark, SF_DIR).collect())
    timings["minhash_lsh_pairs"] = round(best, 3)
    steals["minhash_lsh_pairs"] = runs

    # 5. similarity headliner
    best, runs = timed(lambda: ann_topk(spark, SF_DIR).collect())
    timings["ann_topk"] = round(best, 3)
    steals["ann_topk"] = runs
    extras["runs_sec_steal"] = steals  # [wall, steal, foreign_busy, idle_ok]
    extras["steal_clean_threshold"] = STEAL_CLEAN
    extras["busy_clean_threshold"] = BUSY_CLEAN

    sf = 0.1
    if "sf0.01" in SF_DIR:
        sf = 0.01
    elif "sf0.001" in SF_DIR:
        sf = 0.001
    # Two-parallelism-level evidence for the north rule's N→4N criterion:
    # attach the latest RECORDED protocol captures (bench_scaling.py /
    # bench_cluster.py write these; full tuples in BENCH_SCALING.md) —
    # labeled as recorded captures, not re-measured in this invocation.
    scaling: dict = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for key, fname in (("local_8_vs_32", "BENCH_SCALING.json"),
                       ("cluster_1x8_vs_4x8", "BENCH_CLUSTER.json"),
                       ("cluster_1x4_vs_4x4", "BENCH_CLUSTER_4c.json")):
        path = os.path.join(here, fname)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    rec = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue  # truncated/interrupted capture file — skip, don't
                # lose this run's measurements at the final print
            levels = {lvl: lr.get("docs_per_sec")
                      for lvl, lr in rec.get("levels", {}).items()}
            if key == "local_8_vs_32" and "instantiations" in rec:
                # New bench_scaling.py schema: the headline "value" is
                # the sub-knee local[2]->local[8] pair — report BOTH
                # instantiations under honest labels instead of
                # mislabeling the 2->8 number as 8->32.
                for ikey, ilabel in (("local2_to_local8",
                                      "local_2_vs_8"),
                                     ("local8_to_local32",
                                      "local_8_vs_32")):
                    inst = rec["instantiations"].get(ikey, {})
                    scaling[ilabel] = {
                        "efficiency_N_to_4N": inst.get("efficiency"),
                        "ceiling_efficiency":
                            inst.get("ceiling_efficiency"),
                        "docs_per_sec_by_level": levels,
                        "protocol": rec.get("protocol"),
                        "recorded_capture": fname,
                    }
                continue
            scaling[key] = {
                "efficiency_N_to_4N": rec.get("value"),
                "docs_per_sec_by_level": levels,
                "protocol": rec.get("protocol"),
                "recorded_capture": fname,
            }
    if scaling:
        extras["scaling_evidence"] = scaling

    result = {
        "metric": "headline_suite_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
        "cpus": CPUS,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
