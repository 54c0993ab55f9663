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


# -- interleave_pack: next-fit context-window packing, media atomic -----------

PACK_CTX = 64          # context-window token budget
PACK_MEDIA_BASE = 16   # media span cost = BASE + (doc_id % 3) * STEP
PACK_MEDIA_STEP = 32   # → 16 / 48 / 80; 80 > CTX exercises oversized-atomic


def interleave_pack_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack each interleaved document's spans, in order, into fixed
    token-budget context windows (next-fit): a span never splits (media
    atomicity — the packing constraint interleaved multimodal training
    adds over plain text packing), a span that would overflow the open
    window starts a new one, and an oversized span (cost > PACK_CTX)
    occupies a window alone. Text cost = max(1, ceil(len/4)) tokens;
    media cost = PACK_MEDIA_BASE + (doc_id % 3) * PACK_MEDIA_STEP, so
    the oversized branch occurs on every doc_id ≡ 2 (mod 3).

    Scale shape: ONE shuffle (groupBy doc_id collect), then the next-fit
    state machine is a single JVM ordered fold whose accumulator carries
    the open window's rolling (n_spans, n_media, used) and flushes a
    window SUMMARY on rollover — the fold emits per-window aggregates
    directly, so no second explode+groupBy shuffle is needed. Per-doc
    span counts are small and bounded; the parallelism axis stays the
    document. The oracle re-derives the same assignment with an
    INDEPENDENT recursive-CTE state machine (never list_reduce — the
    DuckDB 1.0 conditional-fold bug)."""
    sp = _interleaved_spans(spark, sf_dir)
    cost = F.when(
        F.col("kind") == "media",
        F.lit(PACK_MEDIA_BASE)
        + (F.col("doc_id") % 3).cast("int") * PACK_MEDIA_STEP,
    ).otherwise(
        F.greatest(F.lit(1),
                   F.expr("(length(text_span) + 3) div 4").cast("int"))
    ).cast("int")
    spans = sp.select(
        "doc_id",
        F.struct(
            F.col("i").alias("i"),
            cost.alias("cost"),
            (F.col("kind") == "media").cast("int").alias("m")).alias("s"))
    win_t = ("array<struct<win:int,n_spans:int,n_media:int,tokens:int>>")
    zero = F.struct(
        F.lit(1).cast("int").alias("win"),
        F.lit(0).cast("int").alias("used"),
        F.lit(0).cast("int").alias("ns"),
        F.lit(0).cast("int").alias("nm"),
        F.array().cast(win_t).alias("out"))

    def step(acc, x):
        is_new = (acc["used"] > 0) & (acc["used"] + x["cost"] > PACK_CTX)
        summary = F.struct(
            acc["win"].alias("win"), acc["ns"].alias("n_spans"),
            acc["nm"].alias("n_media"), acc["used"].alias("tokens"))
        return F.struct(
            F.when(is_new, acc["win"] + 1).otherwise(acc["win"]).alias("win"),
            F.when(is_new, x["cost"]).otherwise(acc["used"] + x["cost"])
            .alias("used"),
            F.when(is_new, F.lit(1)).otherwise(acc["ns"] + 1).alias("ns"),
            (F.when(is_new, F.lit(0)).otherwise(acc["nm"]) + x["m"])
            .alias("nm"),
            F.when(is_new, F.concat(acc["out"], F.array(summary)))
            .otherwise(acc["out"]).alias("out"))

    def finish(acc):
        summary = F.struct(
            acc["win"].alias("win"), acc["ns"].alias("n_spans"),
            acc["nm"].alias("n_media"), acc["used"].alias("tokens"))
        return F.when(acc["used"] > 0,
                      F.concat(acc["out"], F.array(summary))) \
                .otherwise(acc["out"])

    packed = (spans.groupBy("doc_id")
              .agg(F.array_sort(F.collect_list("s")).alias("ss"))
              .select("doc_id",
                      F.explode(F.aggregate("ss", zero, step, finish))
                      .alias("w")))
    return packed.select(
        "doc_id",
        F.col("w.win").alias("win_id"),
        F.col("w.n_spans").alias("n_spans"),
        F.col("w.n_media").alias("n_media"),
        F.col("w.tokens").alias("tokens"),
    ).orderBy("doc_id", "win_id")


INTERLEAVE_PACK_SQL = _SPAN_CTE.replace(
    "WITH s AS", "WITH RECURSIVE s AS", 1) + f"""
, spc AS MATERIALIZED (
  SELECT doc_id, i,
    CASE WHEN kind = 'media'
         THEN {PACK_MEDIA_BASE} + CAST(doc_id % 3 AS INT) * {PACK_MEDIA_STEP}
         ELSE greatest(1, CAST((length(text_span) + 3) // 4 AS INT))
    END AS cost,
    CASE WHEN kind = 'media' THEN 1 ELSE 0 END AS m
  FROM sp
), rec AS (
  SELECT doc_id, i, cost, m, 1 AS win, cost AS used
  FROM spc WHERE i = 0
  UNION ALL
  SELECT s.doc_id, s.i, s.cost, s.m,
    CASE WHEN r.used + s.cost > {PACK_CTX} THEN r.win + 1 ELSE r.win END,
    CASE WHEN r.used + s.cost > {PACK_CTX} THEN s.cost
         ELSE r.used + s.cost END
  FROM rec r JOIN spc s ON s.doc_id = r.doc_id AND s.i = r.i + 1
)
SELECT doc_id, win AS win_id,
       CAST(count(*) AS INT) AS n_spans,
       CAST(sum(m) AS INT) AS n_media,
       CAST(sum(cost) AS INT) AS tokens
FROM rec GROUP BY doc_id, win ORDER BY doc_id, win_id
"""

QUERIES["interleave_pack"] = interleave_pack_query
ORACLES["interleave_pack"] = INTERLEAVE_PACK_SQL


# -- media_dedup_groups: content-addressed media fingerprint dedup -------------

ASSET_MOD = 50  # synthetic asset space: content key = f(doc_id % 50, i)


def media_dedup_groups_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group interleaved documents by their media-asset multiset — the
    media analog of sha_dedupe: two docs embedding exactly the same
    asset sequence are layout duplicates even when their text differs
    (mirrored galleries, re-hosted pages). Asset identity is a
    content-addressed key — here derived deterministically as
    md5(doc_id % ASSET_MOD, position) so the synthetic corpus contains
    real collisions (docs d and d+350 share k, media pattern AND asset
    keys) — in production it is the sha of the decoded media bytes.
    Per doc: the multiset fingerprint (md5 of the sorted asset list),
    group size, and a first-doc canonical flag; all-text docs form the
    explicit '(none)' group rather than disappearing.

    Scale shape: one doc-keyed collect + one fingerprint-keyed
    aggregate join — the sha_dedupe two-shuffle layout; no pair join,
    group stats via the same window pattern first_seen uses."""
    sp = _interleaved_spans(spark, sf_dir)
    asset = F.substring(
        F.md5(F.concat((F.col("doc_id") % ASSET_MOD).cast("string"),
                       F.lit(":"), F.col("i").cast("string"))),
        1, REF_LEN)
    per_doc = (sp.filter(F.col("kind") == "media")
               .select("doc_id", asset.alias("asset"))
               .groupBy("doc_id")
               .agg(F.md5(F.concat_ws(
                   ",", F.array_sort(F.collect_list("asset"))))
                   .alias("media_fp")))
    docs = sp.select("doc_id").distinct()
    fp = (docs.join(per_doc, "doc_id", "left")
          .select("doc_id",
                  F.coalesce("media_fp", F.lit("(none)")).alias("media_fp")))
    w = Window.partitionBy("media_fp")
    return (fp.select(
                "doc_id", "media_fp",
                F.count("*").over(w).alias("group_size"),
                (F.col("doc_id") == F.min("doc_id").over(w))
                .alias("is_canonical"))
            .orderBy("doc_id"))


MEDIA_DEDUP_GROUPS_SQL = _SPAN_CTE + f"""
, per_doc AS (
  SELECT doc_id,
         md5(string_agg(asset, ',' ORDER BY asset)) AS media_fp
  FROM (
    SELECT doc_id,
           substring(md5((doc_id % {ASSET_MOD}) || ':' || i), 1, {REF_LEN})
             AS asset
    FROM sp WHERE kind = 'media'
  ) GROUP BY doc_id
), fp AS (
  SELECT d.doc_id, coalesce(p.media_fp, '(none)') AS media_fp
  FROM (SELECT DISTINCT doc_id FROM sp) d
  LEFT JOIN per_doc p USING (doc_id)
)
SELECT doc_id, media_fp,
       count(*) OVER (PARTITION BY media_fp) AS group_size,
       doc_id = min(doc_id) OVER (PARTITION BY media_fp) AS is_canonical
FROM fp ORDER BY doc_id
"""

QUERIES["media_dedup_groups"] = media_dedup_groups_query
ORACLES["media_dedup_groups"] = MEDIA_DEDUP_GROUPS_SQL
