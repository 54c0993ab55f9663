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

from . import PY_WS_RE

from ..datagen import spans_from_flat_documents
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


EXTRACT_HTML_MARKDOWN_SQL = rf"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'Source: doc://' || doc_id || '/0' || chr(10) || chr(10) ||
       '# Doc ' || doc_id || chr(10) || chr(10) ||
       trim(regexp_replace(text, '{PY_WS_RE}+', ' ', 'g')) || chr(10) AS md
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


def _interleaved_spans(flat: DataFrame) -> DataFrame:
    """Wrap each flat document into a 9-span interleave covering every
    kernel branch with a closed-form expected output: HTML (three container
    variants incl. the largest-div fallback), a WAF interstitial (dropped),
    multi-page PDF layout with a failing page and scrambled reading order,
    noisy OCR (hyphenation + blank runs), JSON and XML (valid + broken
    fallback variants), a zip span (stored-not-rendered, dropped), media
    passthrough, and plain text. Physical span order is scrambled and
    offsets are gapped, so offset-sorting and order renumbering across
    dropped spans are exercised."""
    did = F.col("doc_id").cast("string")
    v = F.col("doc_id") % 3
    core = F.concat(F.lit("<h1>Doc "), did, F.lit("</h1><p>"),
                    F.col("text"), F.lit("</p>"))
    html = F.concat(
        F.lit("<html><head><title>Doc "), did,
        F.lit("</title><script>x()</script></head><body>"
              "<nav><a href='/a'>a</a></nav>"),
        F.when(v == 0, F.concat(F.lit("<main>"), core, F.lit("</main>")))
        .when(v == 1, F.concat(F.lit("<article>"), core, F.lit("</article>")))
        .otherwise(F.concat(F.lit("<div>"), F.col("text"),
                            F.lit("</div><div>x</div>"))),
        F.lit("<footer>f</footer></body></html>"),
    )
    waf = F.lit(
        "<html><head><title>Checking</title></head><body>"
        "<script src='challenge.js'></script>Request blocked</body></html>")
    pdf = F.concat(
        F.lit("@24,40:gamma\n@0,40:alpha "), did,
        F.lit("\n@24,200:delta\n@0,200:beta\f%%ERR corrupted\f@0,40:page three "),
        F.col("source"))
    ocr = F.concat(F.lit("qual-\nity "), F.col("lang"),
                   F.lit("  data\n\n\n\nend "), did)
    json_payload = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.lit("{broken "), did)
    ).otherwise(F.concat(F.lit('{"doc_id": '), did,
                         F.lit(', "lang": "'), F.col("lang"), F.lit('"}')))
    xml_payload = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.lit("<unclosed "), did)
    ).otherwise(F.concat(F.lit("<root><id>"), did, F.lit("</id><t>"),
                         F.col("lang"), F.lit("</t></root>")))

    def span(kind: str, text, media_ref, offset: int):
        return F.struct(
            F.lit(kind).alias("kind"),
            (text if text is not None else F.lit(None).cast("string")).alias("text"),
            (media_ref if media_ref is not None
             else F.lit(None).cast("string")).alias("media_ref"),
            F.lit(offset).alias("offset"),
        )

    spans = F.array(  # physical order deliberately scrambled vs offsets
        span("xml", xml_payload, None, 10),
        span("html", waf, None, 1),
        span("text", F.concat(F.lit("  note "), F.col("source"), F.lit(" ")),
             None, 12),
        span("pdf", pdf, None, 2),
        span("html", html, None, 0),
        span("zip", F.lit("PKx"), None, 7),
        span("media", None, F.substring(F.sha2(F.col("text"), 256), 1, 16), 4),
        span("ocr", ocr, None, 8),
        span("json", json_payload, None, 6),
    )
    return flat.select(did.alias("doc_id"), spans.alias("spans"))


def extract_synthetic_spans(spark, sf_dir):
    """Flagship correctness gate: the full distributed pipeline (salted
    repartition → fused mapInPandas kernel) over a deterministic
    closed-form interleave covering every kernel branch — HTML container
    variants + largest-div fallback, WAF drop, PDF reading-order + failing
    page, OCR normalization, JSON/XML pretty + broken fallbacks, zip drop,
    media passthrough, offset sorting, order renumbering. Every output
    byte is expressible in SQL, so this is hash-checked against DuckDB
    (was rows-only in round 1). The randomized generator corpus
    (datagen.synthetic_documents_df) stays covered by the pytest
    span-equality suite and the benchmark."""
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = extract_df(_interleaved_spans(flat))
    return out.select(
        "doc_id", F.posexplode("out_spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.order").alias("ord"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    ).orderBy("doc_id", "ord")


_NL = "chr(10)"

EXTRACT_SYNTHETIC_SPANS_SQL = rf"""
WITH flat AS (
  SELECT CAST(doc_id AS VARCHAR) AS did, doc_id AS n, text, lang, source,
         trim(regexp_replace(text, '{PY_WS_RE}+', ' ', 'g')) AS tnorm
  FROM documents
)
SELECT did AS doc_id, 0 AS ord, 'markdown' AS kind,
       CASE WHEN n % 3 IN (0, 1)
            THEN 'Source: doc://' || did || '/0' || {_NL} || {_NL} ||
                 '# Doc ' || did || {_NL} || {_NL} || tnorm || {_NL}
            ELSE 'Source: doc://' || did || '/0' || {_NL} || {_NL} ||
                 tnorm || {_NL}
       END AS text,
       NULL AS media_ref
FROM flat
UNION ALL
SELECT did, 1, 'text',
       'alpha ' || did || ' beta' || {_NL} || 'gamma delta' || {_NL} || {_NL} ||
       'page three ' || source || {_NL},
       NULL
FROM flat
UNION ALL
SELECT did, 2, 'media', NULL, substring(sha256(text), 1, 16)
FROM flat
UNION ALL
SELECT did, 3, 'text',
       CASE WHEN n % 5 = 0 THEN '{{broken ' || did || {_NL}
            ELSE '{{' || {_NL} || '  "doc_id": ' || did || ',' || {_NL} ||
                 '  "lang": "' || lang || '"' || {_NL} || '}}' || {_NL}
       END,
       NULL
FROM flat
UNION ALL
SELECT did, 4, 'text',
       'quality ' || lang || ' data' || {_NL} || {_NL} || 'end ' || did || {_NL},
       NULL
FROM flat
UNION ALL
SELECT did, 5, 'text',
       CASE WHEN n % 7 = 0 THEN '<unclosed ' || did || {_NL}
            ELSE '<?xml version="1.0" ?>' || {_NL} || '<root>' || {_NL} ||
                 '  <id>' || did || '</id>' || {_NL} ||
                 '  <t>' || lang || '</t>' || {_NL} || '</root>' || {_NL}
       END,
       NULL
FROM flat
UNION ALL
SELECT did, 6, 'text', 'note ' || source || {_NL}, NULL
FROM flat
ORDER BY doc_id, ord
"""


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
    "extract_synthetic_spans": EXTRACT_SYNTHETIC_SPANS_SQL,
}
