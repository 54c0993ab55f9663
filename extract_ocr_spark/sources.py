"""Document sources beyond the pre-materialized spans table.

- ``ingest_local_html``: the reference's local-seed ingest path (EP2:
  browser-saved HTML files → documents), on ``spark.read.format
  ("binaryFile")`` — reference cli.py:393-512 + crawl.py:872-918.
  Asset directories (``*_files``) are excluded, the original URL is
  recovered from the "saved from url=" comment, and each file becomes one
  spans-shaped row ready for the extraction pipeline.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import DOCUMENTS_SCHEMA

_SAVED_FROM_RE = re.compile(r"saved from url=\(\d+\)(\S+)", re.I)


def saved_from_url(html: str) -> str | None:
    """Recover the original URL from a browser-saved HTML comment
    (reference cli.py:396-404)."""
    m = _SAVED_FROM_RE.search(html[:4096])
    return m.group(1).strip() if m else None


def ingest_local_html(spark: SparkSession, seed_dir: str) -> DataFrame:
    """Read ``*.html`` seeds (excluding ``*_files`` asset dirs) into the
    documents(doc_id, spans) shape. doc_id = recovered URL if present,
    else the file path."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.html")
        .option("recursiveFileLookup", "true")
        .load(seed_dir)
        # reference cli.py:425-431: skip browser asset dirs
        .filter(~F.col("path").rlike(r"_files/"))
        .select("path", "content")
    )

    def to_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, spans = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                html = bytes(content).decode("utf-8", errors="replace")
                url = saved_from_url(html)
                doc_ids.append(url or path)
                spans.append([
                    {"kind": "html", "text": html, "media_ref": None,
                     "offset": 0}
                ])
            yield pd.DataFrame({"doc_id": doc_ids, "spans": spans})

    return files.mapInPandas(to_docs, schema=DOCUMENTS_SCHEMA)
