"""Export-shaped operators: consolidated TOC-ordered index (S13),
markdown link rewrite via broadcast map (E13), asset-intent / host-scope
URL gates (P2/P3), export counts (A7). Each with a DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..kernels.urlkit import rewrite_markdown_links


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


def toc_index_df(toc_html: str, seed_url: str, pages: DataFrame) -> DataFrame:
    """E12 end-to-end: a left-panel TOC seed → ordered URL list →
    consolidated index lines over the exported pages table.

    The TOC seed is ONE driver-side document (exactly as in the reference,
    exporters/endnote25_windows.py:114-118 — the left panel is a single
    local file), so parsing it on the driver is not a scale concern; the
    tiny (ord, url) table is broadcast into the join against the
    arbitrarily large ``pages(url, title, path)`` table. Unexported TOC
    entries render with a missing marker, preserving their slot (the
    reference's TOC keeps seed order regardless of fetch success)."""
    from ..kernels.htmlkit import extract_toc_hrefs
    from ..kernels.urlkit import build_absolute_url_list

    urls = build_absolute_url_list(extract_toc_hrefs(toc_html), seed_url)
    spark = pages.sparkSession
    toc = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "ord long, url string")
    line = F.concat(
        F.lit("- ["),
        F.coalesce(F.col("title"), F.lit("(missing)")),
        F.lit("]("),
        F.coalesce(F.col("path"), F.col("url")),
        F.lit(")"),
    )
    return (
        F.broadcast(toc).join(pages, "url", "left")
        .select("ord", "url", line.alias("toc_line"))
        .orderBy("ord")
    )


# -- E13: general markdown link rewrite via broadcast url→path map -------------
# Reference scripts/export_endnote25_windows.py:347-385, 484-498: build the
# complete URL→local-path map (a genuine barrier), broadcast it, rewrite
# every [label](target) / ![alt](target): relative targets resolved against
# the page URL, fragments re-attached, mailto and external/unmapped targets
# preserved. The regex kernel lives in kernels/urlkit.rewrite_markdown_links.

# The url→path map is the *export set* (the pages being written), which the
# reference collects fully before phase 2 — a genuine barrier. Guard the
# driver collect so a caller cannot accidentally broadcast a corpus-sized
# map; beyond this, restructure as extract-targets → join → reassemble.
MAX_BROADCAST_MAP_ROWS = 2_000_000


def rewrite_links_df(pages: DataFrame, url_map: DataFrame) -> DataFrame:
    """pages(doc_id, page_url, md) + url_map(url, path) → + md_out.

    Phase 1 (barrier): collect the complete normalized url→relpath map and
    broadcast it. Phase 2: Arrow-batched pandas UDF applies the reference's
    regex rewrite per page."""
    n = url_map.count()
    if n > MAX_BROADCAST_MAP_ROWS:
        raise ValueError(
            f"url→path map has {n} rows (> {MAX_BROADCAST_MAP_ROWS}); "
            "broadcast rewrite is for export-set-sized maps — restructure "
            "as an explode-targets equi-join at corpus scale.")
    # Duplicate urls resolve to max(path) — deterministic, and mirrored in
    # the join variant (a raw dict comprehension would silently keep
    # whichever row collected last, diverging between the two paths).
    mapping = {r["url"]: r["path"] for r in url_map.groupBy("url")
               .agg(F.max("path").alias("path")).collect()}
    bc = pages.sparkSession.sparkContext.broadcast(mapping)

    @pandas_udf("string")
    def rw(md: pd.Series, purl: pd.Series) -> pd.Series:
        m = bc.value
        return pd.Series(
            [rewrite_markdown_links(a, b, m) for a, b in zip(md, purl)])

    return pages.withColumn("md_out", rw("md", "page_url"))


def rewrite_links_join_df(pages: DataFrame, url_map: DataFrame) -> DataFrame:
    """Corpus-scale variant of ``rewrite_links_df``: NO driver-side map.

    Phase 1: explode each page's resolved link targets (Arrow-batched
    UDF over the same ``_resolve_md_target`` kernel the broadcast path
    uses). Phase 2: equi-join targets against ``url_map(url, path)`` —
    an ordinary shuffle join that scales to a corpus-sized map; Catalyst
    broadcasts it when it is small. Phase 3: fold matches into a per-page
    mini-map (links-per-page entries, bounded) and run the identical
    rewrite kernel. Output column set matches ``rewrite_links_df``.

    At 10^12 docs this is the shape that survives: the only shuffles are
    keyed on link-target URL and doc_id, the per-page state is O(links on
    that page), and nothing is ever collected to the driver (the
    reference's full-map barrier, scripts/export_endnote25_windows.py:
    484-498, is what this removes)."""
    from ..kernels.urlkit import markdown_link_targets

    @pandas_udf("array<string>")
    def targets(md: pd.Series, purl: pd.Series) -> pd.Series:
        return pd.Series(
            [markdown_link_targets(a, b) for a, b in zip(md, purl)])

    exploded = pages.select(
        "doc_id", F.explode(targets("md", "page_url")).alias("url"))
    # The per-doc payload is an ENTRY ARRAY, not a Spark map: a url mapped
    # to two paths would hit map_from_entries' duplicate-key error, so
    # duplicates ride through and resolve to max(path) inside the UDF —
    # the same resolution the broadcast variant applies — keeping one
    # exchange (collect_set on doc_id) instead of a second dedup shuffle.
    per_doc = (
        exploded.join(url_map, "url")
        .groupBy("doc_id")
        .agg(F.collect_set(F.struct("url", "path")).alias("_link_map"))
    )

    def _to_map(entries) -> dict:
        m: dict[str, str] = {}
        for e in entries if entries is not None else []:
            u, p = e["url"], e["path"]
            if u not in m or p > m[u]:
                m[u] = p
        return m

    @pandas_udf("string")
    def rw(md: pd.Series, purl: pd.Series, lm: pd.Series) -> pd.Series:
        return pd.Series([
            rewrite_markdown_links(a, b, _to_map(m))
            for a, b, m in zip(md, purl, lm)])

    return (
        pages.join(per_doc, "doc_id", "left")
        .withColumn("md_out", rw("md", "page_url", "_link_map"))
        .drop("_link_map")
    )


def _link_fixture(spark, sf_dir):
    """Shared pages/url_map fixture for both rewrite variants: a relative
    link with a fragment, an angle-bracket-wrapped relative link, a
    pure-fragment self link, a mailto, and an external absolute link —
    exercising every branch of the reference rewriter (resolve, fragment
    re-attach, preserve)."""
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id").cast("string")
    md = F.concat(
        F.lit("see [next](doc-"), (F.col("doc_id") + 1).cast("string"),
        F.lit(".html#sec2), [prev](<doc-"), (F.col("doc_id") - 1).cast("string"),
        F.lit(".html>), [self](#frag), [mail](mailto:a@b.c), "
              "[ext](https://other.example/x) end"),
    )
    page_url = F.concat(
        F.lit("https://corpus.example/pages/doc-"), did, F.lit(".html"))
    pages = docs.select("doc_id", page_url.alias("page_url"), md.alias("md"))
    url_map = docs.select(
        F.concat(F.lit("https://corpus.example/pages/doc-"), did,
                 F.lit(".html")).alias("url"),
        F.concat(F.lit("pages/doc-"), did, F.lit(".md")).alias("path"),
    )
    return pages, url_map


def markdown_link_rewrite(spark, sf_dir):
    """Broadcast-map rewrite (export-set-sized maps)."""
    pages, url_map = _link_fixture(spark, sf_dir)
    out = rewrite_links_df(pages, url_map)
    return out.select("doc_id", "md_out").orderBy("doc_id")


def markdown_link_rewrite_join(spark, sf_dir):
    """Explode-join rewrite (corpus-sized maps) — same fixture, same
    oracle as ``markdown_link_rewrite``: the two variants must agree."""
    pages, url_map = _link_fixture(spark, sf_dir)
    out = rewrite_links_join_df(pages, url_map)
    return out.select("doc_id", "md_out").orderBy("doc_id")


MARKDOWN_LINK_REWRITE_SQL = """
SELECT d.doc_id,
       'see [next]('
       || CASE WHEN nxt.doc_id IS NOT NULL
               THEN 'pages/doc-' || (d.doc_id + 1) || '.md#sec2'
               ELSE 'doc-' || (d.doc_id + 1) || '.html#sec2' END
       || '), [prev]('
       || CASE WHEN prv.doc_id IS NOT NULL
               THEN 'pages/doc-' || (d.doc_id - 1) || '.md'
               ELSE '<doc-' || (d.doc_id - 1) || '.html>' END
       || '), [self](pages/doc-' || d.doc_id || '.md#frag)'
       || ', [mail](mailto:a@b.c), [ext](https://other.example/x) end'
         AS md_out
FROM documents d
LEFT JOIN documents nxt ON nxt.doc_id = d.doc_id + 1
LEFT JOIN documents prv ON prv.doc_id = d.doc_id - 1
ORDER BY d.doc_id
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
    "markdown_link_rewrite_join": markdown_link_rewrite_join,
    "url_scope_filter": url_scope_filter,
    "export_counts_events": export_counts_events,
}

ORACLES = {
    "consolidated_index": CONSOLIDATED_INDEX_SQL,
    "markdown_link_rewrite": MARKDOWN_LINK_REWRITE_SQL,
    "markdown_link_rewrite_join": MARKDOWN_LINK_REWRITE_SQL,
    "url_scope_filter": URL_SCOPE_FILTER_SQL,
    "export_counts_events": EXPORT_COUNTS_EVENTS_SQL,
}
