"""Structured Streaming front-end for the extraction pipeline.

The reference is strictly batch with file-based resume (SURVEY.md §2.9);
streaming is the Spark-native extension for continuous ingest: new parquet
files landing in a directory are picked up incrementally, run through the
same ``mapInPandas`` extraction kernel, and appended to the output with
exactly-once semantics via the streaming checkpoint — the streaming
analogue of the lineage anti-join resume.

Also provides a windowed event aggregation with watermarking (late-data
handling), the streaming analogue of ``relational.windowed_event_counts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import _EXTRACT_FULL_SCHEMA, _extract_batches
from .schemas import DOCUMENTS_SCHEMA


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str, *, mode: str = "reference",
                   available_now: bool = True):
    """Continuously extract documents from parquet files arriving in
    ``input_dir``. Returns the StreamingQuery.

    Exactly-once: file-source offsets + sink commit log live in the
    checkpoint; a killed job resumes at the last committed micro-batch
    without reprocessing (streaming replaces the batch lineage table).
    """
    docs = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )
    # No repartition in the stream: the size-class salting is a batch
    # optimization; the streaming micro-batch is already bounded by
    # maxFilesPerTrigger. The kernel is identical.
    extracted = docs.mapInPandas(_extract_batches(mode), schema=_EXTRACT_FULL_SCHEMA)
    writer = (
        extracted.select("doc_id", "out_spans")
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_event_counts(spark: SparkSession, input_dir: str,
                                 *, watermark: str = "1 hour",
                                 window: str = "1 hour") -> DataFrame:
    """Tumbling-window event counts with late-data watermarking. Returns
    the streaming DataFrame (caller attaches a sink). Batch-equivalent:
    relational.windowed_event_counts — same grouping semantics."""
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string")
        .parquet(input_dir)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0)
             .alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "sum_value")
    )
