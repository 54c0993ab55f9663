"""Query/operator registry: every implemented operator from SURVEY.md §2
plus the training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB-equivalent ANSI SQL; omitted keys
get the driver's weaker rows-only check).
"""

from __future__ import annotations

# Engine-invariant whitespace class for tokenizer regexes. Java's \s
# (Spark) matches vertical tab \x0B; RE2's \s (DuckDB) does not, so a
# bare \s+ tokenizer silently diverges between a query and its oracle on
# \x0B-bearing text. Both engines parse the explicit escapes below
# identically, so every Spark split and its SQL twin interpolate these
# instead of \s.
WS_CHARS = r" \t\n\x0B\f\r"
WS_RE = "[" + WS_CHARS + "]"

# Python's whitespace set (re \s on str == str.isspace(), measured: the
# same 29 codepoints) for oracles whose Spark side is a PYTHON kernel
# (htmlkit's \s+ collapse, textstats' str.split()). RE2 accepts the
# \x{...} escapes; Java-expression pairs must keep WS_RE instead (Java
# \s is ASCII-only).
PY_WS_RE = (r"[ \t\n\x0B\f\r\x{001C}-\x{001F}\x{0085}\x{00A0}"
            r"\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}"
            r"\x{205F}\x{3000}]")


def tok_array(col, *, lower: bool = True):
    """The one whitespace tokenizer every JVM-expression operator shares:
    split on WS_RE, drop empties (split of '' yields ['']). Keep oracle
    twins on `regexp_split_to_array(..., '{WS_RE}+')` + list_filter."""
    from pyspark.sql import functions as F

    c = F.lower(col) if lower else col
    return F.filter(F.split(c, WS_RE + "+"), lambda x: x != F.lit(""))


def bigram_array(toks):
    """Adjacent-token bigrams (space-joined) of a token array; empty
    array for <2 tokens. The ONE definition shared by every bigram
    operator (kmv_distinct, dsir_weights) so their oracle twins —
    ``toks[i] || ' ' || toks[i+1]`` over ``unnest(range(1, len(toks)))``
    — can never drift against a second hand-rolled Spark variant.

    The <2 guard is load-bearing: sequence(0, size-2) DESCENDS for a
    1-token array and slice(toks, 0, 2) then throws (the
    repetition_metrics lesson); CASE WHEN evaluates lazily per row, so
    the guarded branch never runs for short docs."""
    from pyspark.sql import functions as F

    return F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.array_join(F.slice(toks, i + 1, 2), " ")),
    ).otherwise(F.expr("array()").cast("array<string>"))


def md5_long(col):
    """Shared 60-bit engine-invariant hash: first 15 md5 hex chars as a
    signed-safe BIGINT. Oracle twin: ('0x' || substring(md5(x), 1,
    15))::BIGINT."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def spread_input(df, key: str = "doc_id"):
    """Scale-adaptive source spread (the dedup._docs policy, shared):
    the driver's test tables are single small parquet files (one input
    split), so CPU-heavy map-side chains (tokenize, shingle, regex)
    would run on one core. When the source has fewer partitions than the
    session's parallelism, spread rows once — a few-MB shuffle buying a
    full-parallel map side. On a real deployment the source has at least
    session parallelism in splits and this is a no-op (an unconditional
    repartition would move the whole corpus for nothing). Used by the
    registry wrappers of measured map-heavy queries; the composable
    ``*_df`` forms are untouched so their plan pins keep the
    shuffle-free shapes."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, key)


# -- r6: codegen-friendly vector folds ----------------------------------------
#
# ``F.aggregate(F.zip_with(...))`` lambdas are INTERPRETED per element —
# a 64-dim cosine costs ~3 HOF folds per pair, and on an O(n²) pair
# frame that interpretation dominated the whole registry sweep
# (embedding_neardup_pairs: 118 s at sf0.1, ~60 µs/pair). The helpers
# below unroll the identical left fold into a plain expression chain —
# ``((0.0 + t0) + t1) + …`` — which whole-stage codegen compiles, with a
# runtime size guard falling back to the original HOF fold for arrays
# of any other length, so the float result is bit-identical for every
# input (same seed, same association order, IEEE multiply is exact
# either way; verified pairwise over all sf0.1 pairs, zero bit diffs).

def _hof_dot(a, b):
    from pyspark.sql import functions as F

    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _hof_sq(a):
    from pyspark.sql import functions as F

    return F.aggregate(F.transform(a, lambda x: x * x),
                       F.lit(0.0), lambda acc, v: acc + v)


def fold_dot(a, b, dim: int):
    """Exact-parity dot product of two array<double> columns: unrolled
    left fold when both have length ``dim``, HOF fold otherwise."""
    from pyspark.sql import functions as F

    expr = F.lit(0.0)
    for i in range(dim):
        expr = expr + a[i] * b[i]
    return F.when((F.size(a) == dim) & (F.size(b) == dim),
                  expr).otherwise(_hof_dot(a, b))


def fold_dot_lit(a, q, dim: int | None = None):
    """Exact-parity dot of an array column with a Python list of floats
    (the literal side never needs a guard — its length IS dim)."""
    from pyspark.sql import functions as F

    dim = len(q) if dim is None else dim
    expr = F.lit(0.0)
    for i in range(dim):
        expr = expr + a[i] * F.lit(float(q[i]))
    qlit = F.array(*[F.lit(float(v)) for v in q])
    return F.when(F.size(a) == dim, expr).otherwise(_hof_dot(a, qlit))


def fold_sq(a, dim: int):
    """Exact-parity sum of squares of an array<double> column (the
    squared L2 norm; wrap in F.sqrt for the norm)."""
    from pyspark.sql import functions as F

    expr = F.lit(0.0)
    for i in range(dim):
        expr = expr + a[i] * a[i]
    return F.when(F.size(a) == dim, expr).otherwise(_hof_sq(a))


def fold_d2_lit(a, c, dim: int | None = None):
    """Exact-parity squared euclidean distance of an array column to a
    Python list of floats: unrolled ``(a_i - c_i)²`` left fold."""
    from pyspark.sql import functions as F

    dim = len(c) if dim is None else dim
    expr = F.lit(0.0)
    for i in range(dim):
        d = a[i] - F.lit(float(c[i]))
        expr = expr + d * d
    clit = F.array(*[F.lit(float(v)) for v in c])
    hof = F.aggregate(F.zip_with(a, clit, lambda x, y: (x - y) * (x - y)),
                      F.lit(0.0), lambda acc, v: acc + v)
    return F.when(F.size(a) == dim, expr).otherwise(hof)


# Integer (BIGINT) fold variants for the quantized paths (int8 scorer,
# PQ codebooks, k-means on quantized vectors). Integer addition is
# associative, so the unrolled sum is exactly the HOF fold's value; the
# guard still mirrors the HOF's null/length semantics.

def fold_dot_long(a, b, dim: int):
    from pyspark.sql import functions as F

    expr = F.lit(0).cast("long")
    for i in range(dim):
        expr = expr + a[i] * b[i]
    hof = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    return F.when((F.size(a) == dim) & (F.size(b) == dim),
                  expr).otherwise(hof)


def fold_dot_lit_long(a, q, dim: int | None = None):
    from pyspark.sql import functions as F

    dim = len(q) if dim is None else dim
    expr = F.lit(0).cast("long")
    for i in range(dim):
        expr = expr + a[i] * F.lit(int(q[i])).cast("long")
    qlit = F.array(*[F.lit(int(v)).cast("long") for v in q])
    hof = F.aggregate(F.zip_with(a, qlit, lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    return F.when(F.size(a) == dim, expr).otherwise(hof)


def fold_sq_long(a, dim: int):
    from pyspark.sql import functions as F

    expr = F.lit(0).cast("long")
    for i in range(dim):
        expr = expr + a[i] * a[i]
    hof = F.aggregate(F.transform(a, lambda x: x * x),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    return F.when(F.size(a) == dim, expr).otherwise(hof)


def fold_d2_lit_long(a, c, dim: int | None = None):
    from pyspark.sql import functions as F

    dim = len(c) if dim is None else dim
    expr = F.lit(0).cast("long")
    for i in range(dim):
        d = a[i] - F.lit(int(c[i])).cast("long")
        expr = expr + d * d
    clit = F.array(*[F.lit(int(v)).cast("long") for v in c])
    hof = F.aggregate(F.zip_with(a, clit, lambda x, y: (x - y) * (x - y)),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    return F.when(F.size(a) == dim, expr).otherwise(hof)


def all_queries():
    from .. import multimodal
    from . import (
        curation,
        dedup,
        export,
        extraction,
        interleave,
        layout,
        links,
        temporal,
        relational,
        reporting,
        robots,
        similarity,
        textanalysis,
    )

    queries = {}
    oracles = {}
    for mod in (relational, extraction, dedup, similarity, textanalysis,
                reporting, export, robots, links, curation, interleave,
                temporal, layout):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    queries["media_features"] = multimodal.media_features_query
    oracles["media_features"] = multimodal.MEDIA_FEATURES_SQL
    queries["resize_media"] = multimodal.resize_media_query
    oracles["resize_media"] = multimodal.RESIZE_MEDIA_SQL
    queries["frame_sample"] = multimodal.frame_sample_query
    oracles["frame_sample"] = multimodal.FRAME_SAMPLE_SQL

    # Registry order is a correctness-evidence concern: the driver's
    # per-round CORRECTNESS check budget covers roughly the first 50
    # entries in dict order, so the queries it skipped last round rotate
    # to the front (names stay stable; only insertion order moves).
    front = (
        # the 18 the r4 driver's ~50-query window skipped (they sat at
        # positions 50-67); r4's front group rotates to the back — its
        # names were all driver-green in CORRECTNESS_r04
        "doc_fingerprints", "top_terms_per_source", "repetition_metrics",
        "citations_ris", "citations_bibtex", "citations_csl",
        "api_endpoint_report", "apis_report_markdown", "resp_md_pick",
        "filename_sanitize", "url_keys", "path_key_report", "ext_guess",
        "consolidated_index", "markdown_link_rewrite", "url_scope_filter",
        "export_counts_events", "robots_gate",
        # queries new in r5 — never driver-checked yet; ordered NEWEST
        # first so the driver's ~50-entry window lands on the operators
        # with the least accumulated verification history (the oldest r5
        # names below have been sweep-verified across many sessions and
        # are the lowest-information picks for the external check)
        "gap_fill_daily", "self_bleu", "nb_lang_confusion",
        "neighbor_agg", "mrr_eval", "quantile_normalize",
        "dedup_pr_eval", "split_leakage_check",
        "ann_topk_pq", "ann_topk_ivfpq",
        "chi2_drift", "cube_report", "hdr_quantiles", "ks_drift",
        "calibration_bins", "rrf_fusion", "pr_curve", "ndcg_eval",
        "classifier_auc",
        "zorder_key", "hilbert_key", "partition_skew_report",
        "target_encode_loo", "partial_agg_merge", "attribution_linear",
        "boilerplate_lines", "fim_plan", "tokenizer_fertility",
        "js_divergence", "ema_value", "hits_scores",
        "late_ship_priority", "dominant_suppliers",
        "k_anonymity", "media_dedup_groups",
        "mmr_rerank", "dictionary_encode",
        "bpe_encode", "interleave_pack", "scd2_intervals",
        "shortest_paths", "revenue_delta", "top_supplier",
        "product_profit", "min_cost_supplier", "important_parts",
        "parts_supplier_counts",
        "bpe_merges",
        "market_share", "attribution_last_touch",
        "hard_negatives", "data_quality_checks", "blocklist_filter",
        "dormant_rich_customers", "late_only_supplier", "small_qty_revenue",
        "nation_trade_volume", "returned_top_customers",
        "cust_order_distribution",
        "span_corruption_plan", "metrics_unpivot",
        "log_odds_terms", "edit_distance_pairs",
        "weighted_sample", "rfm_segments",
        "order_priority_counts", "disjunctive_pricing", "salted_skew_join",
        "incremental_dedup", "ab_lift", "user_event_pivot", "k_core",
        "path_trigrams",
        "prefix_filter_pairs", "large_orders", "trailing_hour_counts",
        "daily_anomalies",
        "promo_revenue_share", "regional_revenue", "churn_labels",
        "top_orders_revenue", "dwell_times", "markov_transitions",
        "link_prediction", "cohort_retention", "contamination_embedding",
        "pca_top_component", "cms_heavy_hitters", "hll_distinct",
        "label_propagation", "triangle_count",
        "skipgram_pairs", "kmeans_clusters", "anchor_text_agg",
        "event_funnel", "hypertable_rollup", "range_join_bins",
        "asof_join", "host_reputation", "embedding_norm_outliers",
        "interleave_stats", "caption_pairs", "cluster_canonical",
        "source_overlap", "ngram_novelty", "vocab_coverage",
        "ann_topk_int8", "pmi_collocations", "minhash_est_pairs",
        "inverted_index", "bloom_url_seen", "ccnet_buckets",
        "token_budget_sample", "length_quantiles", "crawl_diff",
        "crawl_schedule", "pagerank_scores", "tfidf_top_terms",
        "containment_pairs", "dsir_weights", "gopher_rules",
        "kmv_distinct", "char_entropy", "winnow_fingerprints",
        "paragraph_dedup", "corpus_report", "quality_classifier",
        "semdedup", "mixture_weights", "bm25_search", "chunk_documents",
        "bfs_frontier",
    )
    order = [n for n in front if n in queries] + [
        n for n in queries if n not in front]
    queries = {n: queries[n] for n in order}
    oracles = {n: oracles[n] for n in order if n in oracles}
    return queries, oracles
