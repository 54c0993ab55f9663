"""Reporting/export operators: citations (S14), API-endpoint report
(E11 + A3), filename sanitization (P15), title-from-URL + URL hash keys
(P16/P17). All JVM-side expressions, each with a DuckDB oracle.

The reference emits these as files (RIS/CSL/BibTeX sinks, endpoint
markdown report); here each is a deterministic projection/aggregation —
the file sink is a trivial text write of the result column.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import WS_RE
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels.citekit import csl_entry

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


# -- S14: CSL-JSON citations (reference citations.py:41-62) --------------------
# Rendered through the real kernel (citekit.csl_entry + json.dumps with
# indent=2, ensure_ascii=False) inside an Arrow-batched pandas UDF; the
# oracle rebuilds the exact byte layout with string concatenation.

@pandas_udf(T.StringType())
def _csl_udf(doc_id: pd.Series, source: pd.Series) -> pd.Series:
    return pd.Series([
        json.dumps(
            csl_entry(title=f"Doc {d}", url=f"doc://{d}", accessed=ACCESSED,
                      publisher=s),
            indent=2, ensure_ascii=False)
        for d, s in zip(doc_id, source)
    ])


def citations_csl(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", _csl_udf("doc_id", "source").alias("csl")
    ).orderBy("doc_id")


CITATIONS_CSL_SQL = f"""
SELECT doc_id,
       '{{' || chr(10) ||
       '  "type": "webpage",' || chr(10) ||
       '  "title": "Doc ' || doc_id || '",' || chr(10) ||
       '  "URL": "doc://' || doc_id || '",' || chr(10) ||
       '  "accessed": {{' || chr(10) ||
       '    "raw": "{ACCESSED}"' || chr(10) ||
       '  }},' || chr(10) ||
       '  "publisher": "' || source || '"' || chr(10) ||
       '}}' AS csl
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
    out = F.regexp_replace(F.trim(piece), WS_RE + "+", "-")
    out = F.regexp_replace(out, "[^A-Za-z0-9._-]+", "-")
    out = F.regexp_replace(out, "-+", "-")
    out = F.regexp_replace(out, "^-|-$", "")
    out = F.when(out == "", "untitled").otherwise(F.substring(out, 1, 80))
    return docs.select("doc_id", out.alias("fname")).orderBy("doc_id")


FILENAME_SANITIZE_SQL = rf"""
SELECT doc_id,
       CASE WHEN s = '' THEN 'untitled' ELSE substring(s, 1, 80) END AS fname
FROM (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           trim(substring(text, 1, 60)),
           '{WS_RE}+', '-', 'g'),
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


# -- A6: per-path-key missing-file breakdown (export_inspect.py:33-43, 91-148)
# The reference enumerates 9 path keys per manifest event and counts
# missing files per key. Table analog: a paths map per document, a
# deterministic md5-based existence rule (mirrorable in SQL), and a
# groupBy(key) missing histogram via lineage_audit.path_key_breakdown.

PATH_KEYS = ["raw", "page_md", "page_html", "page_txt", "page_json",
             "resp_md", "resp_html", "resp_txt", "resp_json"]


def path_key_report(spark, sf_dir):
    from ..lineage_audit import path_key_breakdown

    docs = _docs(spark, sf_dir)
    entries = docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(k) for k in PATH_KEYS])).alias("path_key"),
    )
    # A path "exists" unless md5(doc_id:key) lands in a 1/7 bucket — a
    # deterministic stand-in for the on-disk existence check.
    probe = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit(":"), F.col("path_key"))), 1, 2),
        16, 10).cast("int")
    entries = entries.withColumn("exists", (probe % 7) != 0)
    return path_key_breakdown(entries)


PATH_KEY_REPORT_SQL = """
WITH keys(path_key) AS (
  VALUES ('raw'), ('page_md'), ('page_html'), ('page_txt'), ('page_json'),
         ('resp_md'), ('resp_html'), ('resp_txt'), ('resp_json')
), entries AS (
  SELECT d.doc_id, k.path_key,
         (('0x' || substring(md5(d.doc_id || ':' || k.path_key), 1, 2))::INT
          % 7) != 0 AS exists
  FROM documents d CROSS JOIN keys k
)
SELECT path_key,
       count(*) AS n_total,
       CAST(sum(CASE WHEN exists THEN 0 ELSE 1 END) AS BIGINT) AS n_missing
FROM entries GROUP BY path_key ORDER BY path_key
"""


# -- P11: URL-explosion guard (crawl.py:1066-1068) + P18: extension guess
# (ingest_data_uspto_gov.py:106-137) ------------------------------------------

_CT_LIST = ["text/html", "application/json", "application/pdf", "text/plain",
            "application/xml", "application/yaml", "application/octet-stream",
            ""]
_PATH_EXT = ["", ".html", ".htm", ".json", ".pdf", ".xml", ".yaml", ".yml",
             ".txt", ".dat"]


def ext_guess(spark, sf_dir):
    """P18 content-type → extension table with URL-path-suffix fallback,
    composed with the P11 path-length ≤ 500 explosion guard."""
    docs = _docs(spark, sf_dir)
    ct = F.element_at(F.array(*[F.lit(c) for c in _CT_LIST]),
                      (F.col("doc_id") % 8 + 1).cast("int"))
    pext = F.element_at(F.array(*[F.lit(e) for e in _PATH_EXT]),
                        (F.col("doc_id") % 10 + 1).cast("int"))
    # Long paths on a 1/9 stripe exercise the explosion guard.
    pad = F.when(F.col("doc_id") % 9 == 0,
                 F.repeat(F.lit("a"), 600)).otherwise(F.lit(""))
    path = F.concat(F.lit("/p/"), pad, F.col("doc_id").cast("string"), pext)
    # reference strips ';charset=...' params then lowercases (ingest :108)
    base = F.trim(F.lower(F.split(ct, ";").getItem(0)))
    ext = (
        F.when(base.isin("text/html", "application/xhtml+xml"), ".html")
        .when(base.isin("application/json", "text/json"), ".json")
        .when(base == "application/pdf", ".pdf")
        .when(base == "text/plain", ".txt")
        .when(base.isin("application/xml", "text/xml"), ".xml")
        .when(base.isin("application/yaml", "text/yaml", "application/x-yaml"),
              ".yaml")
        .otherwise(
            F.when(F.lower(path).endswith(".html"), ".html")
            .when(F.lower(path).endswith(".htm"), ".htm")
            .when(F.lower(path).endswith(".json"), ".json")
            .when(F.lower(path).endswith(".pdf"), ".pdf")
            .when(F.lower(path).endswith(".xml"), ".xml")
            .when(F.lower(path).endswith(".yaml"), ".yaml")
            .when(F.lower(path).endswith(".yml"), ".yml")
            .when(F.lower(path).endswith(".txt"), ".txt")
            .otherwise(".bin"))
    )
    return (
        docs.select("doc_id", ct.alias("content_type"), path.alias("path"),
                    ext.alias("ext"))
        .filter(F.length("path") <= 500)  # P11 explosion guard
        .orderBy("doc_id")
    )


EXT_GUESS_SQL = """
WITH u AS (
  SELECT doc_id,
         ['text/html', 'application/json', 'application/pdf', 'text/plain',
          'application/xml', 'application/yaml', 'application/octet-stream',
          ''][(doc_id % 8) + 1] AS content_type,
         '/p/' || CASE WHEN doc_id % 9 = 0 THEN repeat('a', 600) ELSE '' END
                || doc_id
                || ['', '.html', '.htm', '.json', '.pdf', '.xml', '.yaml',
                    '.yml', '.txt', '.dat'][(doc_id % 10) + 1] AS path
  FROM documents
)
SELECT doc_id, content_type, path,
       CASE WHEN content_type IN ('text/html', 'application/xhtml+xml') THEN '.html'
            WHEN content_type IN ('application/json', 'text/json') THEN '.json'
            WHEN content_type = 'application/pdf' THEN '.pdf'
            WHEN content_type = 'text/plain' THEN '.txt'
            WHEN content_type IN ('application/xml', 'text/xml') THEN '.xml'
            WHEN content_type IN ('application/yaml', 'text/yaml',
                                  'application/x-yaml') THEN '.yaml'
            WHEN lower(path) LIKE '%.html' THEN '.html'
            WHEN lower(path) LIKE '%.htm' THEN '.htm'
            WHEN lower(path) LIKE '%.json' THEN '.json'
            WHEN lower(path) LIKE '%.pdf' THEN '.pdf'
            WHEN lower(path) LIKE '%.xml' THEN '.xml'
            WHEN lower(path) LIKE '%.yaml' THEN '.yaml'
            WHEN lower(path) LIKE '%.yml' THEN '.yml'
            WHEN lower(path) LIKE '%.txt' THEN '.txt'
            ELSE '.bin' END AS ext
FROM u
WHERE length(path) <= 500
ORDER BY doc_id
"""


# -- E11 rendering: the endpoint-inventory markdown blocks ---------------------
# Reference apis_report.py:278-292: per endpoint, a `- [endpoint](resp_md)`
# line (missing marker when the resp.md file does not exist — always the
# case in table-land, where no export dir is mounted) followed by
# textwrap-wrapped `  - source:` bullets (:141-163). resp_md uses the
# fallback pages/<title>--<sha12>.resp.md convention (:56-66).

def apis_report_markdown(spark, sf_dir):
    """Endpoint inventory blocks: the api_endpoint_report grouping plus
    the reference's exact markdown rendering. Wrapping runs through the
    real textwrap kernel in an Arrow-batched UDF; the synthetic source
    URLs are space/hyphen-free, for which textwrap provably degenerates
    to fixed 88-char slicing — giving the render a hash-exact oracle."""
    from ..kernels.textops import wrap_source_bullets

    docs = _docs(spark, sf_dir)
    md = F.concat(
        F.lit("see /apis/v1/"), F.col("source"), F.lit("/q"),
        (F.col("n_chars") % 7).cast("string"),
        F.lit(" and [x](/apis/v2/"), F.col("lang"), F.lit(") end"),
    )
    src = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("https://data.example.gov/p/"),
                 F.col("doc_id").cast("string")),
    ).otherwise(
        F.concat(F.lit("https://data.example.gov/"),
                 F.repeat(F.concat(F.lit("seg"),
                                   (F.col("doc_id") % 3).cast("string"),
                                   F.lit("/")), 20),
                 F.lit("doc"), F.col("doc_id").cast("string")))
    hits = (
        docs.withColumn("md", md).withColumn("src", src)
        .select("src", F.explode(F.expr(
            r"regexp_extract_all(md, '/apis/[a-z0-9/._-]+', 0)"))
            .alias("endpoint"))
    )
    grouped = hits.groupBy("endpoint").agg(
        F.array_sort(F.collect_set("src")).alias("sources"))

    resp_md = F.concat(
        F.lit("pages/"), F.element_at(F.split("endpoint", "/"), -1),
        F.lit("--"), F.substring(F.sha2("endpoint", 256), 1, 12),
        F.lit(".resp.md"))

    @pandas_udf(T.StringType())
    def render(endpoint: pd.Series, rmd: pd.Series,
               sources: pd.Series) -> pd.Series:
        out = []
        for e, r, srcs in zip(endpoint, rmd, sources):
            lines = [f"- [{e}]({r}) (MISSING resp.md)"]
            for s in srcs:
                lines.extend(wrap_source_bullets(s))
            out.append("\n".join(lines))
        return pd.Series(out)

    return (
        grouped.withColumn("resp_md", resp_md)
        .select("endpoint",
                render("endpoint", "resp_md", "sources").alias("block_md"))
        .orderBy("endpoint")
    )


APIS_REPORT_MARKDOWN_SQL = r"""
WITH base AS (
  SELECT doc_id,
         'see /apis/v1/' || source || '/q' || (n_chars % 7)
           || ' and [x](/apis/v2/' || lang || ') end' AS md,
         CASE WHEN doc_id % 2 = 0
              THEN 'https://data.example.gov/p/' || doc_id
              ELSE 'https://data.example.gov/'
                   || repeat('seg' || (doc_id % 3) || '/', 20)
                   || 'doc' || doc_id END AS src
  FROM documents
), hits AS (
  SELECT DISTINCT src,
         unnest(regexp_extract_all(md, '/apis/[a-z0-9/._-]+')) AS endpoint
  FROM base
), chunks AS (
  SELECT endpoint, src,
         unnest(range(0, CAST(ceil(length(src) / 88.0) AS BIGINT))) AS i
  FROM hits
), bullets AS (
  SELECT endpoint, src,
         string_agg(
           CASE WHEN i = 0 THEN '  - source: ' ELSE repeat(' ', 12) END
             || substring(src, CAST(i * 88 + 1 AS INT), 88),
           chr(10) ORDER BY i) AS bullet
  FROM chunks GROUP BY endpoint, src
)
SELECT endpoint,
       '- [' || endpoint || '](pages/' || split_part(endpoint, '/', -1)
       || '--' || substring(sha256(endpoint), 1, 12)
       || '.resp.md) (MISSING resp.md)' || chr(10)
       || string_agg(bullet, chr(10) ORDER BY src) AS block_md
FROM bullets
GROUP BY endpoint
ORDER BY endpoint
"""


# -- A4 at full strength: exists-on-disk resp_md preference --------------------
# Reference apis_report.py:189-204: manifest events are replayed in order;
# a candidate whose file exists on disk always overwrites, a candidate
# whose file is missing only fills an empty slot. Net: the LAST existing
# candidate wins, else the FIRST candidate seen.

def resp_md_pick(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ev = docs.select(
        F.col("source").alias("endpoint"),
        F.col("doc_id").alias("seq"),
        F.concat(F.lit("pages/r"), F.col("doc_id").cast("string"),
                 F.lit(".resp.md")).alias("candidate"),
        (F.col("doc_id") % 3 == 0).alias("on_disk"),
    )
    last_existing = (
        ev.filter("on_disk").groupBy("endpoint")
        .agg(F.max_by("candidate", "seq").alias("existing")))
    first_any = ev.groupBy("endpoint").agg(
        F.min_by("candidate", "seq").alias("first_seen"))
    return (
        first_any.join(last_existing, "endpoint", "left")
        .select("endpoint",
                F.coalesce("existing", "first_seen").alias("resp_md"))
        .orderBy("endpoint")
    )


RESP_MD_PICK_SQL = """
WITH ev AS (
  SELECT source AS endpoint, doc_id AS seq,
         'pages/r' || doc_id || '.resp.md' AS candidate,
         doc_id % 3 = 0 AS on_disk
  FROM documents
)
SELECT endpoint,
       coalesce(
         arg_max(candidate, seq) FILTER (WHERE on_disk),
         arg_min(candidate, seq)) AS resp_md
FROM ev GROUP BY endpoint ORDER BY endpoint
"""


QUERIES = {
    "citations_ris": citations_ris,
    "citations_bibtex": citations_bibtex,
    "citations_csl": citations_csl,
    "api_endpoint_report": api_endpoint_report,
    "apis_report_markdown": apis_report_markdown,
    "resp_md_pick": resp_md_pick,
    "filename_sanitize": filename_sanitize,
    "url_keys": url_keys,
    "path_key_report": path_key_report,
    "ext_guess": ext_guess,
}

ORACLES = {
    "citations_ris": CITATIONS_RIS_SQL,
    "citations_bibtex": CITATIONS_BIBTEX_SQL,
    "citations_csl": CITATIONS_CSL_SQL,
    "api_endpoint_report": API_ENDPOINT_REPORT_SQL,
    "apis_report_markdown": APIS_REPORT_MARKDOWN_SQL,
    "resp_md_pick": RESP_MD_PICK_SQL,
    "filename_sanitize": FILENAME_SANITIZE_SQL,
    "url_keys": URL_KEYS_SQL,
    "path_key_report": PATH_KEY_REPORT_SQL,
    "ext_guess": EXT_GUESS_SQL,
}
