"""DataFrame schemas for the extraction engine (see FIXTURES.md).

The input table shape is authoritative from BASELINE.json ``input_hint``:
``documents(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)``.
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
    ]
)

OUT_SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("order", T.IntegerType(), True),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("out_spans", T.ArrayType(OUT_SPAN_STRUCT), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("event_kind", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("at", T.TimestampType(), True),
        T.StructField("snapshot_id", T.LongType(), True),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), True),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("docs", T.LongType(), True),
        T.StructField("spans_in", T.LongType(), True),
        T.StructField("spans_out", T.LongType(), True),
        T.StructField("bytes_in", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("at", T.TimestampType(), True),
    ]
)
