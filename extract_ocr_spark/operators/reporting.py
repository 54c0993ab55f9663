"""Reporting/export operators: citations (S14), API-endpoint report
(E11 + A3), filename sanitization (P15), title-from-URL + URL hash keys
(P16/P17). All JVM-side expressions, each with a DuckDB oracle.

The reference emits these as files (RIS/CSL/BibTeX sinks, endpoint
markdown report); here each is a deterministic projection/aggregation —
the file sink is a trivial text write of the result column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ACCESSED = "2026-01-01"  # deterministic accessed-date literal


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# -- S14: citation sinks (reference citations.py:18-87) -----------------------

def citations_ris(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ris = F.concat(
        F.lit("TY  - ELEC\nTI  - Doc "), F.col("doc_id").cast("string"),
        F.lit("\nPB  - "), F.col("source"),
        F.lit("\nUR  - doc://"), F.col("doc_id").cast("string"),
        F.lit(f"\nY2  - {ACCESSED}\nER  - "),
    )
    return docs.select("doc_id", ris.alias("ris")).orderBy("doc_id")


CITATIONS_RIS_SQL = f"""
SELECT doc_id,
       'TY  - ELEC' || chr(10) || 'TI  - Doc ' || doc_id || chr(10) ||
       'PB  - ' || source || chr(10) ||
       'UR  - doc://' || doc_id || chr(10) ||
       'Y2  - {ACCESSED}' || chr(10) || 'ER  - ' AS ris
FROM documents ORDER BY doc_id
"""


def citations_bibtex(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bib = F.concat(
        F.lit("@online{ref"), F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        F.lit(",\n  title = {Doc "), F.col("doc_id").cast("string"),
        F.lit("},\n  organization = {"), F.col("source"),
        F.lit("},\n  url = {doc://"), F.col("doc_id").cast("string"),
        F.lit(f"}},\n  urldate = {{{ACCESSED}}},\n}}"),
    )
    return docs.select("doc_id", bib.alias("bibtex")).orderBy("doc_id")


CITATIONS_BIBTEX_SQL = f"""
SELECT doc_id,
       '@online{{ref' || lpad(CAST(doc_id AS VARCHAR), 4, '0') || ',' || chr(10) ||
       '  title = {{Doc ' || doc_id || '}},' || chr(10) ||
       '  organization = {{' || source || '}},' || chr(10) ||
       '  url = {{doc://' || doc_id || '}},' || chr(10) ||
       '  urldate = {{{ACCESSED}}},' || chr(10) || '}}' AS bibtex
FROM documents ORDER BY doc_id
"""


# -- E11 + A3: API-endpoint regex extract → endpoint→sources report -----------

def api_endpoint_report(spark, sf_dir):
    """Regex-extract /apis/... endpoints from rendered text, group by
    endpoint, collect the sorted set of source docs (reference
    apis_report.py:109-126, 184-245)."""
    docs = _docs(spark, sf_dir)
    md = F.concat(
        F.lit("see /apis/v1/"), F.col("source"), F.lit("/q"),
        (F.col("n_chars") % 7).cast("string"),
        F.lit(" and [x](/apis/v2/"), F.col("lang"), F.lit(") end"),
    )
    hits = (
        docs.withColumn("md", md)
        .select("doc_id", F.explode(F.expr(
            r"regexp_extract_all(md, '/apis/[a-z0-9/._-]+', 0)")).alias("endpoint"))
    )
    return (
        hits.groupBy("endpoint")
        .agg(
            F.count("*").alias("n_hits"),
            F.concat_ws(",", F.transform(
                F.array_sort(F.collect_set("doc_id")),
                lambda x: x.cast("string"))).alias("source_docs"),
        )
        .orderBy("endpoint")
    )


API_ENDPOINT_REPORT_SQL = r"""
WITH md AS (
  SELECT doc_id,
         'see /apis/v1/' || source || '/q' || (n_chars % 7)
           || ' and [x](/apis/v2/' || lang || ') end' AS md
  FROM documents
), hits AS (
  SELECT doc_id, unnest(regexp_extract_all(md, '/apis/[a-z0-9/._-]+')) AS endpoint
  FROM md
)
SELECT endpoint, count(*) AS n_hits,
       array_to_string(list(DISTINCT doc_id ORDER BY doc_id), ',') AS source_docs
FROM hits GROUP BY endpoint ORDER BY endpoint
"""


# -- P15: filename sanitization (reference urls.py:64-71) ----------------------

def filename_sanitize(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    piece = F.substring("text", 1, 60)
    out = F.regexp_replace(F.trim(piece), r"\s+", "-")
    out = F.regexp_replace(out, "[^A-Za-z0-9._-]+", "-")
    out = F.regexp_replace(out, "-+", "-")
    out = F.regexp_replace(out, "^-|-$", "")
    out = F.when(out == "", "untitled").otherwise(F.substring(out, 1, 80))
    return docs.select("doc_id", out.alias("fname")).orderBy("doc_id")


FILENAME_SANITIZE_SQL = r"""
SELECT doc_id,
       CASE WHEN s = '' THEN 'untitled' ELSE substring(s, 1, 80) END AS fname
FROM (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           trim(substring(text, 1, 60)),
           '\s+', '-', 'g'),
           '[^A-Za-z0-9._-]+', '-', 'g'),
           '-+', '-', 'g'),
           '^-|-$', '', 'g') AS s
  FROM documents
) ORDER BY doc_id
"""


# -- P16/P17: URL hash key + title-from-URL (crawl.py:711-712, 400-409) --------

def url_keys(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    url = F.concat(F.lit("https://ex.com/"), F.col("source"),
                   F.lit("/page-"), F.col("doc_id").cast("string"),
                   F.lit(".html"))
    title = F.element_at(F.split(url, "/"), -1)
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.substring(F.sha2(url, 256), 1, 12).alias("url_key"),
        F.coalesce(F.nullif(title, F.lit("")), F.lit("response")).alias("title"),
    ).orderBy("doc_id")


URL_KEYS_SQL = """
WITH u AS (
  SELECT doc_id,
         'https://ex.com/' || source || '/page-' || doc_id || '.html' AS url
  FROM documents
)
SELECT doc_id, url,
       substring(sha256(url), 1, 12) AS url_key,
       coalesce(nullif(split_part(url, '/', -1), ''), 'response') AS title
FROM u ORDER BY doc_id
"""


QUERIES = {
    "citations_ris": citations_ris,
    "citations_bibtex": citations_bibtex,
    "api_endpoint_report": api_endpoint_report,
    "filename_sanitize": filename_sanitize,
    "url_keys": url_keys,
}

ORACLES = {
    "citations_ris": CITATIONS_RIS_SQL,
    "citations_bibtex": CITATIONS_BIBTEX_SQL,
    "api_endpoint_report": API_ENDPOINT_REPORT_SQL,
    "filename_sanitize": FILENAME_SANITIZE_SQL,
    "url_keys": URL_KEYS_SQL,
}
