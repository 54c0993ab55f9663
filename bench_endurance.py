#!/usr/bin/env python
"""10× corpus endurance point: extraction over a 1.2M-doc (~8 GB)
synthetic spans corpus — the scale the 100-TB design claims extrapolate
from. Evidence sought: per-doc cost flat vs the 120k-doc headline
(docs/s within ~15%) and bounded executor memory (single local-mode JVM:
its VmHWM peak RSS is the executor peak).

Prints ONE JSON line; timing discipline shared with bench.py.

Env: SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_ENDURANCE_DOCS (default 1200000).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BUSY_CLEAN, force_extraction, timed  # noqa: E402
from bench_scaling import STEAL_CLEAN  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_ENDURANCE_DOCS", "1200000"))
CORPUS_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_data",
    f"spans_v3_{N_DOCS}")


def _jvm_peak_rss_kib(driver_pid: int) -> int:
    """VmHWM of the local-mode JVM (the one direct child of this driver
    running java) — in local mode that single process IS the executor, so
    its high-water RSS is the executor peak memory."""
    peak = 0
    for path in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(path) as f:
                rest = f.read().rsplit(")", 1)[1].split()
            if int(rest[1]) != driver_pid:
                continue
            pid = path.split("/")[2]
            with open(f"/proc/{pid}/cmdline") as f:
                if b"java" not in f.read().encode()[:200]:
                    continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        peak = max(peak, int(line.split()[1]))
        except (OSError, IndexError, ValueError):
            continue
    return peak


def main() -> None:
    from extract_ocr_spark.datagen import synthetic_documents_df
    from extract_ocr_spark.pipeline import extract_digest_df
    from extract_ocr_spark.session import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name="bench-endurance",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(CORPUS_DIR, "_SUCCESS")):
        # 512 output files: >= 4 task waves at 32 cores even for the
        # small-doc majority, same wave-quantization logic as bench.py.
        synthetic_documents_df(spark, N_DOCS, seed=42, partitions=512) \
            .write.mode("overwrite").parquet(CORPUS_DIR)

    parts = 4 * max(8, CPUS)
    docs = spark.read.parquet(CORPUS_DIR)
    n = force_extraction(extract_digest_df(docs, partitions=parts))
    best, runs = timed(
        lambda: force_extraction(extract_digest_df(docs, partitions=parts)),
        attempts=2, extra_if_dirty=1)

    corpus_bytes = sum(
        os.path.getsize(p) for p in glob.glob(f"{CORPUS_DIR}/*.parquet"))
    print(json.dumps({
        "metric": "endurance_extract_wall_sec",
        "value": round(best, 3),
        "unit": "sec",
        "queries": {"extract_endurance": round(best, 3)},
        "sf": "endurance",
        "docs": n,
        "docs_per_sec": round(n / best, 1),
        "corpus_gib": round(corpus_bytes / 2**30, 2),
        "jvm_peak_rss_gib": round(_jvm_peak_rss_kib(os.getpid()) / 2**20, 2),
        "runs_sec_steal": {"extract_endurance": runs},
        "steal_clean_threshold": STEAL_CLEAN,
        "busy_clean_threshold": BUSY_CLEAN,
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
