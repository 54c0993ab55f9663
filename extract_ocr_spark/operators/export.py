"""Export-shaped operators: consolidated TOC-ordered index (S13),
markdown link rewrite via broadcast map (E13), asset-intent / host-scope
URL gates (P2/P3), export counts (A7). Each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# -- S13: consolidated index in seed (TOC) order -------------------------------
# Reference exporters/endnote25_windows.py:174-184: TOC markdown follows
# the seed order; body concatenation preserves it. Seed order here = the
# first-seen order of sources, then doc_id.

def consolidated_index(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    entry = F.concat(
        F.lit("- [Doc "), F.col("doc_id").cast("string"),
        F.lit("](pages/doc-"), F.col("doc_id").cast("string"),
        F.lit(".md) — "), F.col("source"),
    )
    return (
        docs.select(
            F.col("source"), F.col("doc_id"), entry.alias("toc_line"))
        .orderBy("source", "doc_id")
    )


CONSOLIDATED_INDEX_SQL = """
SELECT source, doc_id,
       '- [Doc ' || doc_id || '](pages/doc-' || doc_id || '.md) — ' || source
         AS toc_line
FROM documents ORDER BY source, doc_id
"""


# -- E13: markdown link rewrite via broadcast url→path map ---------------------
# Reference scripts/export_endnote25_windows.py:347-385, 484-498: build the
# complete URL→local-path map (a genuine barrier), broadcast it, rewrite
# [label](target) links. Here the "corpus map" maps doc urls to local .md
# paths; links to in-corpus urls are rewritten, externals preserved.

def markdown_link_rewrite(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    # Each doc's markdown links to the "next" doc in its source group and
    # to one external url.
    md = F.concat(
        F.lit("see [next](doc://"), (F.col("doc_id") + 1).cast("string"),
        F.lit(") and [ext](https://example.com/x)"),
    )
    pages = docs.select("doc_id", md.alias("md"))
    # Phase 1 (barrier): the full url→path map.
    url_map = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("pages/doc-"), F.col("doc_id").cast("string"),
                 F.lit(".md")).alias("path"),
    )
    # Phase 2: broadcast join on the extracted link target; rewrite when
    # mapped, keep original otherwise.
    with_target = pages.withColumn(
        "target", F.regexp_extract("md", r"\[next\]\(([^)]*)\)", 1))
    joined = with_target.join(
        F.broadcast(url_map), with_target.target == url_map.url, "left")
    rewritten = F.when(
        F.col("path").isNotNull(),
        F.concat(F.lit("see [next]("), F.col("path"),
                 F.lit(") and [ext](https://example.com/x)")),
    ).otherwise(F.col("md"))
    return joined.select("doc_id", rewritten.alias("md_out")).orderBy("doc_id")


MARKDOWN_LINK_REWRITE_SQL = """
WITH pages AS (
  SELECT doc_id,
         'see [next](doc://' || (doc_id + 1) || ') and [ext](https://example.com/x)' AS md,
         'doc://' || (doc_id + 1) AS target
  FROM documents
), url_map AS (
  SELECT 'doc://' || doc_id AS url,
         'pages/doc-' || doc_id || '.md' AS path
  FROM documents
)
SELECT p.doc_id,
       CASE WHEN m.path IS NOT NULL
            THEN 'see [next](' || m.path || ') and [ext](https://example.com/x)'
            ELSE p.md END AS md_out
FROM pages p LEFT JOIN url_map m ON p.target = m.url
ORDER BY p.doc_id
"""


# -- P2/P3: asset-intent + host-scope URL gates ---------------------------------

_ASSET_RE = (
    r"\.(css|js|mjs|map|png|jpg|jpeg|gif|webp|svg|ico|woff|woff2|ttf|otf"
    r"|eot|pdf|zip|gz|tgz)$"
)


def url_scope_filter(spark, sf_dir):
    """Synthesize urls across hosts/extensions; keep in-scope non-asset
    pages (reference urls.py:35-61, 74-89)."""
    docs = _docs(spark, sf_dir)
    ext = F.element_at(
        F.array(F.lit(".html"), F.lit(".css"), F.lit(".pdf"), F.lit(".json"),
                F.lit(""), F.lit(".png")),
        (F.col("doc_id") % 6 + 1).cast("int"))
    host = F.element_at(
        F.array(F.lit("docs.example.gov"), F.lit("cdn.other.com"),
                F.lit("api.example.gov"), F.lit("example.gov")),
        (F.col("doc_id") % 4 + 1).cast("int"))
    url = F.concat(F.lit("https://"), host, F.lit("/p/"),
                   F.col("doc_id").cast("string"), ext)
    in_scope = (host == "example.gov") | host.endswith(".example.gov")
    not_asset = ~F.lower(url).rlike(_ASSET_RE)
    return (
        docs.select("doc_id", url.alias("url"))
        .filter(in_scope & not_asset)
        .orderBy("doc_id")
    )


URL_SCOPE_FILTER_SQL = r"""
WITH u AS (
  SELECT doc_id,
         ['.html', '.css', '.pdf', '.json', '', '.png'][(doc_id % 6) + 1] AS ext,
         ['docs.example.gov', 'cdn.other.com', 'api.example.gov',
          'example.gov'][(doc_id % 4) + 1] AS host
  FROM documents
)
SELECT doc_id, 'https://' || host || '/p/' || doc_id || ext AS url
FROM u
WHERE (host = 'example.gov' OR host LIKE '%.example.gov')
  AND NOT regexp_matches(lower('https://' || host || '/p/' || doc_id || ext),
      '\.(css|js|mjs|map|png|jpg|jpeg|gif|webp|svg|ico|woff|woff2|ttf|otf|eot|pdf|zip|gz|tgz)$')
ORDER BY doc_id
"""


# -- A7: export counts over an event log ---------------------------------------

def export_counts_events(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.agg(
        F.count("*").alias("count_requested"),
        F.sum(F.when(F.col("event_type") != "error", 1).otherwise(0))
        .alias("count_exported"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .alias("count_failed"),
    )


EXPORT_COUNTS_EVENTS_SQL = """
SELECT count(*) AS count_requested,
       CAST(sum(CASE WHEN event_type != 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS count_exported,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS count_failed
FROM events
"""


QUERIES = {
    "consolidated_index": consolidated_index,
    "markdown_link_rewrite": markdown_link_rewrite,
    "url_scope_filter": url_scope_filter,
    "export_counts_events": export_counts_events,
}

ORACLES = {
    "consolidated_index": CONSOLIDATED_INDEX_SQL,
    "markdown_link_rewrite": MARKDOWN_LINK_REWRITE_SQL,
    "url_scope_filter": URL_SCOPE_FILTER_SQL,
    "export_counts_events": EXPORT_COUNTS_EVENTS_SQL,
}
