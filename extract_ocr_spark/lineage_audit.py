"""Lineage/export integrity audit — the reference's `inspect-export`
reproduced over tables (reference export_inspect.py:46-163: per-path-key
missing counts, bounded samples, kind histogram; exit-4 semantics become a
boolean + structured report).

At 100 TB these are metadata-sized aggregations: lineage carries one slim
row per document, so every audit below is a single shuffle on counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAMPLE_CAP = 25  # reference export_inspect.py:106-107


def audit_run(documents: DataFrame, lineage: DataFrame,
              extracted: DataFrame) -> dict:
    """Completeness audit of one extraction run.

    Returns counts + bounded samples; ``ok`` is False when any document is
    missing from lineage or output (the reference's missing-file exit 4).
    """
    doc_ids = documents.select("doc_id")
    processed = lineage.filter(F.col("event_kind") == "processed") \
                       .select("doc_id").distinct()
    out_ids = extracted.select("doc_id").distinct()

    missing_lineage = doc_ids.join(processed, "doc_id", "left_anti")
    missing_output = doc_ids.join(out_ids, "doc_id", "left_anti")
    orphan_output = out_ids.join(doc_ids, "doc_id", "left_anti")
    dup_lineage = (
        lineage.filter(F.col("event_kind") == "processed")
        .groupBy("doc_id").count().filter(F.col("count") > 1)
    )

    kind_hist = {
        r["event_kind"]: r["n"]
        for r in lineage.groupBy("event_kind").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_kind").collect()
    }

    n_missing_lineage = missing_lineage.count()
    n_missing_output = missing_output.count()
    n_orphans = orphan_output.count()
    n_dups = dup_lineage.count()
    return {
        "ok": n_missing_lineage == 0 and n_missing_output == 0,
        "docs": doc_ids.count(),
        "processed": processed.count(),
        "missing_lineage": n_missing_lineage,
        "missing_output": n_missing_output,
        "orphan_output": n_orphans,
        "duplicate_lineage": n_dups,
        "event_kind_histogram": kind_hist,
        "missing_sample": [
            r["doc_id"] for r in missing_lineage.limit(SAMPLE_CAP).collect()
        ],
    }


def path_key_breakdown(entries: DataFrame) -> DataFrame:
    """Per-path-key missing counts (reference export_inspect.py:33-43,
    91-148: 9 enumerated path keys, per-key missing histogram).

    ``entries`` carries one row per (doc, path_key) with a boolean
    ``exists``; the breakdown is a single shuffle on the 9 keys."""
    return (
        entries.groupBy("path_key")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("exists"), 0).otherwise(1)).alias("n_missing"),
        )
        .orderBy("path_key")
    )


def export_counts(lineage: DataFrame) -> DataFrame:
    """Reference A7 (scripts/export_endnote25_windows.py:512-518):
    count_requested / count_exported / count_failed as one aggregate."""
    return lineage.agg(
        F.count("*").alias("count_requested"),
        F.sum(F.when(F.col("event_kind") == "processed", 1).otherwise(0))
        .alias("count_exported"),
        F.sum(F.when(F.col("event_kind") == "error", 1).otherwise(0))
        .alias("count_failed"),
    )
