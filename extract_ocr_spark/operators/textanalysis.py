"""Text-analysis operators over the documents table: token counting,
quality metrics (native expressions, oracle-checked), language ID and
document fingerprinting (Arrow-batched pandas UDFs, rows-only)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels.textstats import fingerprint, lang_id


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_counts(spark, sf_dir):
    """Whitespace tokens + BPE-ish regex tokens (words / punctuation)."""
    docs = _docs(spark, sf_dir)
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = F.size(F.expr(r"regexp_extract_all(text, '\\w+|[^\\w\\s]', 0)"))
    return docs.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens")
    ).orderBy("doc_id")


TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '\w+|[^\w\s]')) AS bpe_tokens
FROM documents ORDER BY doc_id
"""


def quality_metrics(spark, sf_dir):
    """Length / alpha-ratio / punct-ratio / mean-word-length quality
    signals, all JVM-side."""
    docs = _docs(spark, sf_dir)
    n = F.length("text")
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace("text", r"[\w\s]", ""))
    words = F.split(F.trim(F.col("text")), r"\s+")
    mean_wlen = F.round(
        (F.length(F.concat_ws("", words)).cast("double")) / F.size(words), 6)
    return docs.select(
        "doc_id",
        n.alias("n_chars_actual"),
        F.round(alpha.cast("double") / n, 6).alias("alpha_ratio"),
        F.round(punct.cast("double") / n, 6).alias("punct_ratio"),
        mean_wlen.alias("mean_word_len"),
    ).orderBy("doc_id")


QUALITY_METRICS_SQL = r"""
SELECT doc_id,
       length(text) AS n_chars_actual,
       round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
             / length(text), 6) AS alpha_ratio,
       round(length(regexp_replace(text, '[\w\s]', '', 'g')) * 1.0
             / length(text), 6) AS punct_ratio,
       round(length(array_to_string(regexp_split_to_array(trim(text), '\s+'), '')) * 1.0
             / len(regexp_split_to_array(trim(text), '\s+')), 6) AS mean_word_len
FROM documents ORDER BY doc_id
"""


@pandas_udf(T.StringType())
def _lang_id_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lang_id)


@pandas_udf(T.LongType())
def _fingerprint_udf(texts: pd.Series) -> pd.Series:
    # mod 2^61-1 fits in int64
    return texts.map(fingerprint)


def lang_id_pred(spark, sf_dir):
    """Stopword-profile language ID (Arrow-batched pandas UDF). The
    predicted language is compared against the table's lang column as an
    agreement histogram."""
    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn("lang_pred", _lang_id_udf("text"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "lang_pred")
    )


def doc_fingerprints(spark, sf_dir):
    """Rolling polynomial hash fingerprint per document (pandas UDF),
    distinct-counted per source as a dedup-readiness signal."""
    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn("fp", _fingerprint_udf("text"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("fp").alias("n_distinct_fp"))
        .orderBy("source")
    )


QUERIES = {
    "token_counts": token_counts,
    "quality_metrics": quality_metrics,
    "lang_id_pred": lang_id_pred,
    "doc_fingerprints": doc_fingerprints,
}

ORACLES = {
    "token_counts": TOKEN_COUNTS_SQL,
    "quality_metrics": QUALITY_METRICS_SQL,
}


_TOP_TERMS_SCHEMA = "source string, term string, tf bigint, n_docs bigint"


def _top_terms_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: top-5 terms for one source group by raw term
    frequency (ties broken alphabetically — deterministic)."""
    from collections import Counter

    counts: Counter = Counter()
    for text in pdf["text"]:
        counts.update(str(text).lower().split())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    src = pdf["source"].iloc[0]
    return pd.DataFrame(
        {"source": [src] * len(top),
         "term": [t for t, _ in top],
         "tf": [c for _, c in top],
         "n_docs": [len(pdf)] * len(top)})


def top_terms_per_source(spark, sf_dir):
    """Per-source top terms via ``applyInPandas`` (grouped-map UDF): each
    source's documents arrive as one pandas group. Deterministic
    tie-breaks → stable output (rows-only check)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select("source", "text")
        .groupBy("source")
        .applyInPandas(_top_terms_fn, schema=_TOP_TERMS_SCHEMA)
        .orderBy("source", F.desc("tf"), "term")
    )


QUERIES["top_terms_per_source"] = top_terms_per_source
