"""End-to-end extraction queries with DuckDB oracles.

``spans_from_flat_documents`` wraps each driver document into a fixed
HTML/JSON/media/OCR span template (datagen.py), so the full distributed
extraction pipeline (salted repartition → mapInPandas kernel) has a
closed-form expected output per span kind — expressed as oracle SQL. This
is the flagship correctness gate: a value mismatch in the HTML tokenizer,
boilerplate selection, markdown emitter, JSON pretty-printer, OCR
normalizer, or ordering logic shows up as a hash mismatch here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import spans_from_flat_documents, synthetic_documents_df
from ..pipeline import extract_df


def _extracted_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = spans_from_flat_documents(flat)
    out = extract_df(docs)
    return out.select(
        "doc_id", F.posexplode("out_spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.order").alias("ord"),
    )


def extract_html_markdown(spark, sf_dir):
    """HTML span → boilerplate-stripped ATX markdown (order 0)."""
    return (
        _extracted_flat(spark, sf_dir)
        .filter(F.col("ord") == 0)
        .select("doc_id", F.col("text").alias("md"))
        .orderBy("doc_id")
    )


EXTRACT_HTML_MARKDOWN_SQL = r"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'Source: doc://' || doc_id || '/0' || chr(10) || chr(10) ||
       '# Doc ' || doc_id || chr(10) || chr(10) ||
       trim(regexp_replace(text, '\s+', ' ', 'g')) || chr(10) AS md
FROM documents ORDER BY doc_id
"""


def extract_json_pretty(spark, sf_dir):
    """JSON span → pretty-printed (indent=2) text (order 1)."""
    return (
        _extracted_flat(spark, sf_dir)
        .filter(F.col("ord") == 1)
        .select("doc_id", F.col("text").alias("pretty"))
        .orderBy("doc_id")
    )


EXTRACT_JSON_PRETTY_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       '{' || chr(10) ||
       '  "doc_id": ' || doc_id || ',' || chr(10) ||
       '  "lang": "' || lang || '",' || chr(10) ||
       '  "source": "' || source || '",' || chr(10) ||
       '  "n_chars": ' || n_chars || chr(10) ||
       '}' || chr(10) AS pretty
FROM documents ORDER BY doc_id
"""


def extract_media_ref(spark, sf_dir):
    """Media span passthrough: (kind='media', text NULL, media_ref) (order 2)."""
    return (
        _extracted_flat(spark, sf_dir)
        .filter(F.col("ord") == 2)
        .select("doc_id", "kind", "media_ref")
        .orderBy("doc_id")
    )


EXTRACT_MEDIA_REF_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'media' AS kind,
       substring(sha256(text), 1, 16) AS media_ref
FROM documents ORDER BY doc_id
"""


def extract_ocr_norm(spark, sf_dir):
    """OCR span → whitespace-normalized text (order 3)."""
    return (
        _extracted_flat(spark, sf_dir)
        .filter(F.col("ord") == 3)
        .select("doc_id", F.col("text").alias("norm"))
        .orderBy("doc_id")
    )


EXTRACT_OCR_NORM_SQL = r"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       trim(regexp_replace(substring(text, 1, 200), '[ \t]+', ' ', 'g'))
         || chr(10) AS norm
FROM documents ORDER BY doc_id
"""


def extract_synthetic_spans(spark, sf_dir):
    """Full synthetic-corpus extraction (all kernels: HTML variants, PDF
    layout, OCR, JSON/XML fallbacks, WAF drops, media, interleave order).
    Not SQL-expressible → rows-only check; span-level equality is covered
    by tests/test_pipeline.py against the pure-kernel oracle."""
    docs = synthetic_documents_df(spark, 300, seed=42)
    out = extract_df(docs)
    return out.select(
        "doc_id", F.posexplode("out_spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.order").alias("ord"),
        F.col("span.kind").alias("kind"),
        F.sha2(F.coalesce(F.col("span.text"), F.lit("")), 256).alias("text_sha"),
        F.col("span.media_ref").alias("media_ref"),
    ).orderBy("doc_id", "ord")


QUERIES = {
    "extract_html_markdown": extract_html_markdown,
    "extract_json_pretty": extract_json_pretty,
    "extract_media_ref": extract_media_ref,
    "extract_ocr_norm": extract_ocr_norm,
    "extract_synthetic_spans": extract_synthetic_spans,
}

ORACLES = {
    "extract_html_markdown": EXTRACT_HTML_MARKDOWN_SQL,
    "extract_json_pretty": EXTRACT_JSON_PRETTY_SQL,
    "extract_media_ref": EXTRACT_MEDIA_REF_SQL,
    "extract_ocr_norm": EXTRACT_OCR_NORM_SQL,
}
