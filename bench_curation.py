#!/usr/bin/env python
"""Curation-layer headline benchmark: times jobs/curate_job.run — the
composed dedup → quality → repetition gate → decontamination → split →
pack pipeline — end-to-end at the bench scale factor, writing the real
partitioned output each attempt (the write is part of the pipeline).

Prints ONE JSON line mirroring bench.py's format; timing discipline is
shared with bench.py (min-of-3, per-run [wall, steal, foreign_busy,
idle_ok] tuples, clean = steal < 0.5% AND foreign busy < 2%).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BUSY_CLEAN, timed  # noqa: E402
from bench_scaling import STEAL_CLEAN  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from extract_ocr_spark.session import get_spark
    from jobs.curate_job import run

    spark = get_spark(f"local[{CPUS}]", app_name="bench-curation",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()

    workdir = tempfile.mkdtemp(prefix="bench_curation_")
    stats: dict = {}

    def one_pass() -> None:
        out = os.path.join(workdir, "out")
        shutil.rmtree(out, ignore_errors=True)
        stats.update(run(spark, docs, out))

    one_pass()  # untimed warm-up (JIT, Python worker pool)
    best, runs = timed(one_pass)
    shutil.rmtree(workdir, ignore_errors=True)

    sf = 0.1
    if "sf0.01" in SF_DIR:
        sf = 0.01
    elif "sf0.001" in SF_DIR:
        sf = 0.001
    print(json.dumps({
        "metric": "curation_pipeline_wall_sec",
        "value": round(best, 3),
        "unit": "sec",
        "queries": {"curate_job": round(best, 3)},
        "sf": sf,
        "docs_in": n_docs,
        "docs_per_sec": round(n_docs / best, 1),
        "stats": stats,
        "runs_sec_steal": {"curate_job": runs},
        "steal_clean_threshold": STEAL_CLEAN,
        "busy_clean_threshold": BUSY_CLEAN,
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
