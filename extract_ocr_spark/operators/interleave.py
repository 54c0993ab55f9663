"""Structure operators over INTERLEAVED text+media span documents — the
exact input shape the north rule names (doc_id, spans:array<struct<kind,
text, media_ref, offset>>).

- ``caption_pairs``: media→caption alignment. For every media span, pick
  the nearest preceding text span as its caption (falling back to the
  nearest following one) — the pairing step a multimodal training
  pipeline runs before image-text contrastive training (reference analog:
  the media spans the extractor emits interleaved with markdown text,
  SURVEY §2 E-ops / O7 span order).
- ``interleave_stats``: per-document interleaving structure — span/kind
  counts, kind transitions, text volume, and the longest consecutive
  media run (gaps-and-islands) — the corpus-shape report that decides
  packing and filtering policy for interleaved training data.

Both operate on a deterministic variable-length interleaving synthesized
from the flat documents table with native expressions only, so the DuckDB
oracle can rebuild the identical spans: doc ``d`` has ``3 + d % 5`` spans
and span ``i`` is media iff ``(d + i) % 7 < 3`` (runs of 1-3 media spans,
all-media and all-text docs both occur, so every caption_src branch and
max_media_run=0 are exercised).

Scale shape: both queries are ONE window pass partitioned by doc_id over
the exploded spans — no self-join, no driver loop; at 10^12 docs the
partition key is the document, the natural parallelism axis, and the
per-doc span count is small and bounded. The caption window is two
frame-bounded IGNORE NULLS lookups; the stats pass is lag + one
gaps-and-islands row_number, then a single map-side-combinable groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUERIES = {}
ORACLES = {}

K_BASE = 3        # min spans per doc
K_SPREAD = 5      # k = K_BASE + doc_id % K_SPREAD  (3..7 spans)
MEDIA_MOD = 7     # span i is media iff (doc_id + i) % MEDIA_MOD < MEDIA_LT
MEDIA_LT = 3
TEXT_STRIDE = 17  # text span i = substring(text, 1 + TEXT_STRIDE*i, TEXT_LEN)
TEXT_LEN = 40
REF_LEN = 12      # media_ref = first 12 hex of md5("<doc_id>:<i>")


def _interleaved_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded deterministic interleaving: (doc_id, i, kind, text_span,
    media_ref). Native expressions only — the oracle's _SPAN_CTE rebuilds
    the same rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    k = F.lit(K_BASE) + F.col("doc_id") % K_SPREAD
    sp = docs.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0).cast("long"), k - 1)).alias("i"))
    is_media = (F.col("doc_id") + F.col("i")) % MEDIA_MOD < MEDIA_LT
    return sp.select(
        "doc_id", "i",
        F.when(is_media, F.lit("media")).otherwise(F.lit("text"))
        .alias("kind"),
        F.when(is_media, F.lit(None).cast("string")).otherwise(
            F.substring(
                F.col("text"),
                (F.lit(1) + F.lit(TEXT_STRIDE) * F.col("i")).cast("int"),
                TEXT_LEN)).alias("text_span"),
        F.when(is_media, F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                           F.col("i").cast("string"))), 1, REF_LEN))
        .otherwise(F.lit(None).cast("string")).alias("media_ref"),
    )


_SPAN_CTE = f"""
WITH s AS (
  SELECT doc_id, unnest(range({K_BASE} + doc_id % {K_SPREAD})) AS i, text
  FROM documents
), sp AS (
  SELECT doc_id, i,
    CASE WHEN (doc_id + i) % {MEDIA_MOD} < {MEDIA_LT}
         THEN 'media' ELSE 'text' END AS kind,
    CASE WHEN (doc_id + i) % {MEDIA_MOD} < {MEDIA_LT} THEN NULL
         ELSE substring(text, 1 + {TEXT_STRIDE} * CAST(i AS INT), {TEXT_LEN})
         END AS text_span,
    CASE WHEN (doc_id + i) % {MEDIA_MOD} < {MEDIA_LT}
         THEN substring(md5(doc_id || ':' || i), 1, {REF_LEN})
         ELSE NULL END AS media_ref
  FROM s
)
"""


def caption_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = _interleaved_spans(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("i")
    text_only = F.when(F.col("kind") == "text", F.col("text_span"))
    prev_t = F.last(text_only, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    next_t = F.first(text_only, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing))
    return (sp.select(
                "doc_id", "i", "kind", "media_ref",
                prev_t.alias("prev_t"), next_t.alias("next_t"))
            .filter(F.col("kind") == "media")
            .select(
                "doc_id",
                F.col("i").alias("offset"),
                "media_ref",
                F.coalesce("prev_t", "next_t").alias("caption"),
                F.when(F.col("prev_t").isNotNull(), "prev")
                .when(F.col("next_t").isNotNull(), "next")
                .otherwise("none").alias("caption_src"))
            .orderBy("doc_id", "offset"))


CAPTION_PAIRS_SQL = _SPAN_CTE + """
, cap AS (
  SELECT doc_id, i, kind, media_ref,
    last_value(text_span IGNORE NULLS) OVER
      (PARTITION BY doc_id ORDER BY i
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_t,
    first_value(text_span IGNORE NULLS) OVER
      (PARTITION BY doc_id ORDER BY i
       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_t
  FROM sp
)
SELECT doc_id, i AS "offset", media_ref,
       coalesce(prev_t, next_t) AS caption,
       CASE WHEN prev_t IS NOT NULL THEN 'prev'
            WHEN next_t IS NOT NULL THEN 'next'
            ELSE 'none' END AS caption_src
FROM cap WHERE kind = 'media' ORDER BY doc_id, i
"""

QUERIES["caption_pairs"] = caption_pairs_query
ORACLES["caption_pairs"] = CAPTION_PAIRS_SQL


def interleave_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = _interleaved_spans(spark, sf_dir)
    w_ord = Window.partitionBy("doc_id").orderBy("i")
    w_kind = Window.partitionBy("doc_id", "kind").orderBy("i")
    s2 = sp.select(
        "doc_id", "i", "kind", "text_span",
        F.lag("kind").over(w_ord).alias("prev_kind"),
        (F.col("i") - F.row_number().over(w_kind)).alias("grp"))
    base = s2.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("kind") == "media", 1).otherwise(0))
        .alias("n_media"),
        F.sum(F.when(F.col("kind") == "text", 1).otherwise(0))
        .alias("n_text"),
        F.sum(F.when(F.col("prev_kind").isNotNull()
                     & (F.col("prev_kind") != F.col("kind")), 1)
              .otherwise(0)).alias("n_transitions"),
        F.sum(F.when(F.col("kind") == "text",
                     F.length("text_span")).otherwise(0))
        .cast("long").alias("text_chars"))
    runs = (s2.filter(F.col("kind") == "media")
            .groupBy("doc_id", "grp").agg(F.count("*").alias("c"))
            .groupBy("doc_id").agg(F.max("c").alias("max_media_run")))
    return (base.join(runs, "doc_id", "left")
            .select("doc_id", "n_spans", "n_media", "n_text",
                    "n_transitions", "text_chars",
                    F.coalesce("max_media_run", F.lit(0))
                    .alias("max_media_run"))
            .orderBy("doc_id"))


INTERLEAVE_STATS_SQL = _SPAN_CTE + """
, s2 AS (
  SELECT doc_id, i, kind, text_span,
    lag(kind) OVER (PARTITION BY doc_id ORDER BY i) AS prev_kind,
    i - row_number() OVER (PARTITION BY doc_id, kind ORDER BY i) AS grp
  FROM sp
), base AS (
  SELECT doc_id,
    count(*) AS n_spans,
    CAST(sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_media,
    CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_text,
    CAST(sum(CASE WHEN prev_kind IS NOT NULL AND prev_kind != kind
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_transitions,
    CAST(sum(CASE WHEN kind = 'text' THEN length(text_span) ELSE 0 END)
         AS BIGINT) AS text_chars
  FROM s2 GROUP BY doc_id
), runs AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_media_run FROM (
    SELECT doc_id, grp, count(*) AS c FROM s2
    WHERE kind = 'media' GROUP BY doc_id, grp
  ) GROUP BY doc_id
)
SELECT b.doc_id, n_spans, n_media, n_text, n_transitions, text_chars,
       coalesce(max_media_run, 0) AS max_media_run
FROM base b LEFT JOIN runs r ON b.doc_id = r.doc_id
ORDER BY b.doc_id
"""

QUERIES["interleave_stats"] = interleave_stats_query
ORACLES["interleave_stats"] = INTERLEAVE_STATS_SQL
