"""The commit-protocol seam (ParquetMarkerSink / IcebergCommitSink).

The sandbox has no Iceberg runtime jar, so the real-catalog test skips
cleanly here and runs on any deployment that launches pytest with
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` (README
"Iceberg deployment"). What DOES run in-sandbox: the protocol-order
contract — ``commit_one`` must drive any sink through exactly
write_extracted → read_back → write_lineage → write_metrics → finalize,
which is the property that makes the two sinks interchangeable."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from extract_ocr_spark.datagen import synthetic_documents_df
from extract_ocr_spark.pipeline import (
    ExtractionRun,
    IcebergCommitSink,
    ParquetMarkerSink,
)


class _RecordingSink(ParquetMarkerSink):
    """Delegates to the real parquet sink, recording the call order."""

    def __init__(self, run):
        super().__init__(run)
        self.calls: list[str] = []

    def write_extracted(self, df, b):
        self.calls.append("write_extracted")
        super().write_extracted(df, b)

    def read_back(self, b):
        self.calls.append("read_back")
        return super().read_back(b)

    def write_lineage(self, df):
        self.calls.append("write_lineage")
        super().write_lineage(df)

    def write_metrics(self, df):
        self.calls.append("write_metrics")
        super().write_metrics(df)

    def finalize(self, b):
        self.calls.append("finalize")
        super().finalize(b)


def test_commit_one_drives_sink_in_protocol_order(spark, tmp_path):
    out = str(tmp_path / "seam")
    run = ExtractionRun(spark, out, run_id="seam-run")
    sink = _RecordingSink(run)
    run.sink = sink

    docs = synthetic_documents_df(spark, 6, seed=42, partitions=1)
    run.commit_one(docs, 0)

    assert sink.calls == ["write_extracted", "read_back", "write_lineage",
                          "write_metrics", "finalize"]
    # and the run is fully committed through the recorded sink
    assert run._committed_keys() == ["0:seam-run"]
    assert run.extracted().count() == 6
    assert run.lineage().filter(
        F.col("event_kind") == "processed").count() == 6


def _iceberg_jar_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_iceberg_sink_end_to_end(spark, tmp_path):
    """Real writeTo(...).append() path — runs only where the Iceberg
    runtime jar is on the classpath (skips in this sandbox: no jar, no
    network). Protocol shape already covered above; this adds the
    catalog wiring."""
    if not _iceberg_jar_present(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath")

    spark.conf.set("spark.sql.catalog.lake",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.lake.type", "hadoop")
    spark.conf.set("spark.sql.catalog.lake.warehouse",
                   str(tmp_path / "warehouse"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")

    out = str(tmp_path / "iceberg")
    run = ExtractionRun(spark, out, run_id="ice-run")
    run.sink = IcebergCommitSink(run, "lake.db")
    docs = synthetic_documents_df(spark, 6, seed=42, partitions=1)
    run.commit_one(docs, 0)

    assert spark.read.table("lake.db.extracted").count() == 6
    assert spark.read.table("lake.db.lineage").filter(
        F.col("event_kind") == "processed").count() == 6
    assert spark.read.table("lake.db.metrics").count() >= 1
    # the read seam: committed readers and idempotent resume work
    # against catalog tables exactly as against parquet+markers
    assert run.extracted().count() == 6
    assert run.lineage().filter(
        F.col("event_kind") == "processed").count() == 6
    assert run.pending(docs).count() == 0  # everything already committed


import os


class _FakeCatalogSink(IcebergCommitSink):
    """IcebergCommitSink with the physical catalog swapped for parquet
    directories (one per table name): every append is still independently
    visible like an Iceberg snapshot commit, so the metrics-confirmed
    read-side gating — the property under test — is exercised for real
    without the runtime jar."""

    def __init__(self, run, root: str):
        super().__init__(run, "fake.db")
        self._root = root

    def _append(self, df, table):
        df.write.mode("append").parquet(
            os.path.join(self._root, table.split(".")[-1]))

    def _read_table(self, name):
        return self.run.spark.read.parquet(os.path.join(self._root, name))


def _catalog_run(spark, tmp_path, run_id):
    out = str(tmp_path / "out")
    run = ExtractionRun(spark, out, run_id=run_id)
    run.sink = _FakeCatalogSink(run, str(tmp_path / "cat"))
    return run


def test_iceberg_read_gating_half_committed_batches_invisible(spark, tmp_path):
    """The three appends are not a transaction on Iceberg; the read side
    must treat the metrics append as the commit point so a crash anywhere
    mid-protocol leaves the batch invisible and its docs pending."""
    docs = synthetic_documents_df(spark, 8, seed=42, partitions=1)

    # crash after write_extracted, before lineage: orphan extracted rows
    run1 = _catalog_run(spark, tmp_path, "ice-r1")
    with pytest.raises(RuntimeError):
        run1.commit_one(docs, 0, _crash_before_lineage=True)
    assert run1.extracted().count() == 0          # orphans invisible
    assert run1.lineage() is None
    assert run1.pending(docs).count() == 8        # everything re-runs

    # crash after lineage, before metrics: lineage rows unconfirmed
    run2 = _catalog_run(spark, tmp_path, "ice-r2")
    with pytest.raises(RuntimeError):
        run2.commit_one(docs, 0, _crash_before_marker=True)
    assert run2.extracted().count() == 0
    lineage = run2.lineage()
    assert lineage is None or lineage.count() == 0
    assert run2.pending(docs).count() == 8

    # a clean resume commits everything exactly once
    run3 = _catalog_run(spark, tmp_path, "ice-r3")
    run3.run(docs, micro_batches=1)
    assert run3.extracted().count() == 8
    assert run3.lineage().filter(
        F.col("event_kind") == "processed").count() == 8
    assert run3.pending(docs).count() == 0


def test_iceberg_streaming_committer_replay_safe(spark, tmp_path):
    """The epoch committer routed through the sink seam: on a catalog
    sink there are no marker files, so it runs in per-doc mode — a
    replayed epoch anti-joins against committed lineage and shrinks to
    empty instead of double-appending lineage events."""
    from extract_ocr_spark.streaming import make_epoch_committer

    docs = synthetic_documents_df(spark, 10, seed=7, partitions=1)
    run = _catalog_run(spark, tmp_path, "ice-stream")
    commit = make_epoch_committer(run, str(tmp_path / "ckpt"))

    commit(docs, 0)
    assert run.lineage().count() == 10
    commit(docs, 0)  # replay of the same epoch (offset not checkpointed)
    assert run.lineage().count() == 10            # no double commit
    # genuinely new docs in a later epoch still land
    more = synthetic_documents_df(spark, 15, seed=7, partitions=1)
    commit(more, 1)
    assert run.lineage().count() == 15
