"""Distributed link extraction (E1/E2): the HTML-kernel link extractor as
an Arrow-batched UDF over constructed pages, exploded to one row per link.
Oracle: the page template is closed-form, so the expected link set is
expressible in SQL (base-href resolution + normalization included).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.htmlkit import extract_links

_LINKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


def extract_links_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a page per document with a <base href>, relative + absolute +
    fragment + mailto links; extract with the kernel; explode."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    html = F.concat(
        F.lit("<html><head><base href='https://EX.com/Sub/'></head><body>"
              "<a href='page-"), F.col("doc_id").cast("string"),
        F.lit(".html'>rel</a>"
              "<a href='/abs?agt=index'>abs</a>"
              "<a href='#frag'>skip</a>"
              "<a href='mailto:a@b.c'>skip</a>"
              "<a href='HTTPS://Other.COM/P#x'>off</a>"
              "</body></html>"),
    )
    pages = docs.select("doc_id", html.alias("html"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            links = [
                extract_links(h, page_url=f"https://ex.com/start/{d}")
                for d, h in zip(pdf["doc_id"], pdf["html"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "links": links})

    out = pages.mapInPandas(fn, schema=_LINKS_SCHEMA)
    return (
        out.select("doc_id", F.posexplode("links").alias("pos", "link"))
        .orderBy("doc_id", "pos")
    )


EXTRACT_LINKS_SQL = """
SELECT doc_id, pos, link FROM (
  SELECT doc_id, 0 AS pos,
         'https://ex.com/Sub/page-' || doc_id || '.html' AS link
  FROM documents
  UNION ALL
  SELECT doc_id, 1, 'https://ex.com/abs' FROM documents
  UNION ALL
  SELECT doc_id, 2, 'https://other.com/P' FROM documents
) ORDER BY doc_id, pos
"""

QUERIES = {"extract_links": extract_links_query}
ORACLES = {"extract_links": EXTRACT_LINKS_SQL}
