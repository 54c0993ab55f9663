"""Lineage/export integrity audit tests (reference inspect-export analog)."""

from pyspark.sql import functions as F

from extract_ocr_spark.datagen import synthetic_documents_df
from extract_ocr_spark.lineage_audit import audit_run, export_counts
from extract_ocr_spark.pipeline import ExtractionRun


def test_audit_complete_and_incomplete(spark, tmp_path):
    docs = synthetic_documents_df(spark, 60, seed=42, partitions=4).cache()
    out = str(tmp_path / "run")
    run = ExtractionRun(spark, out, run_id="audit1")

    # partial run → audit must flag missing docs
    run.run(docs, micro_batches=3, stop_after=2)
    lineage = spark.read.parquet(f"{out}/lineage")
    extracted = run.extracted()
    rep = audit_run(docs, lineage, extracted)
    assert not rep["ok"]
    assert rep["missing_lineage"] > 0
    assert rep["missing_lineage"] == rep["missing_output"]
    assert len(rep["missing_sample"]) <= 25
    assert rep["event_kind_histogram"]["processed"] == rep["processed"]

    # complete the run → audit passes, no duplicates
    ExtractionRun(spark, out, run_id="audit2").run(docs, micro_batches=3)
    lineage = spark.read.parquet(f"{out}/lineage")
    rep2 = audit_run(docs, lineage, run.extracted())
    assert rep2["ok"]
    assert rep2["docs"] == rep2["processed"] == 60
    assert rep2["duplicate_lineage"] == 0
    assert rep2["orphan_output"] == 0

    counts = export_counts(lineage).first()
    assert counts["count_requested"] == 60
    assert counts["count_exported"] == 60
    assert counts["count_failed"] == 0
