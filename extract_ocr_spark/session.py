"""SparkSession factory tuned for the extraction workload.

Local-mode testing config; the same settings are what we'd submit on a real
cluster via ``spark-submit --py-files`` (see README), except memory sizing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches bound memory of the mapInPandas extraction stage: one batch
# holds `maxRecordsPerBatch` full documents (spans arrays of large strings).
# 256 docs × ~100 KB typical doc ≈ 25 MB/batch; skewed oversized docs are
# isolated by size-class salting before this stage.
ARROW_MAX_RECORDS_PER_BATCH = 256


def get_spark(master: str | None = None, *, app_name: str = "extract_ocr_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else cpus
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_MAX_RECORDS_PER_BATCH))
        # 32 MB local splits: extraction parallelism for small-doc
        # partitions comes from input splits (no full-corpus shuffle), so
        # splits must outnumber cores. On a real cluster with hundreds of
        # executors, raise back toward 128 MB.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "33554432"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Unfiltered count()/min/max over parquet answer from footer
        # metadata instead of scanning rows — the brute-force guards
        # (similarity._guard_brute, dedup's pair caps) count whole tables
        # before every run, and at 100 TB a guard must not cost a scan.
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # InferFiltersFromGenerate injects `size(g) > 0 AND isnotnull(g)`
        # below every explode(g) and pushes it toward the scan. When g is
        # a computed array (this repo's tokenizers/shinglers: regexp +
        # split + transform chains), that filter RE-EVALUATES the whole
        # construction 2× more per row — measured 3.8 s → 0.5 s on the
        # sf0.1 shingle explode, and it compounds into every
        # tokenize-then-explode query. The rule only pre-drops rows
        # explode() drops anyway (empty/null arrays), so excluding it
        # cannot change any result; it would only help if empty-array
        # rows had to cross a shuffle before the explode, which never
        # happens here (arrays are built in the same stage).
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        # Stall tolerance: on an oversubscribed VM (or a busy cluster
        # node) the driver can be starved long enough that executors
        # accumulate 60 consecutive heartbeat failures and self-exit,
        # killing the whole SparkContext mid-job. A longer heartbeat
        # interval and network timeout widen the survival window from
        # ~10 min to ~20 min of intermittent starvation at no cost on a
        # healthy box.
        .config("spark.executor.heartbeatInterval", "20s")
        .config("spark.network.timeout", "600s")
    )
    return builder.getOrCreate()
