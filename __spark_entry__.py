"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship extraction — wrap sf0.001 documents into the
interleaved spans shape, run the distributed extraction pipeline, return
the exploded output spans.

``queries``/``oracle_sql``: every implemented operator from SURVEY.md §2
plus the training-data-pipeline operators (dedup / similarity / text
analysis / end-to-end extraction), checked against DuckDB at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from extract_ocr_spark.datagen import spans_from_flat_documents
    from extract_ocr_spark.pipeline import extract_df

    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = spans_from_flat_documents(flat)
    out = extract_df(docs)
    return out.select(
        "doc_id", F.posexplode("out_spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.order").alias("ord"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from extract_ocr_spark.operators import all_queries

    q, _ = all_queries()
    return q


def oracle_sql() -> dict[str, str]:
    from extract_ocr_spark.operators import all_queries

    _, o = all_queries()
    return o
