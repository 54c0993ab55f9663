"""The applyInPandas grouped-map top-terms variant (API demo) must agree
with the native partial-aggregation scale path."""

from __future__ import annotations

from extract_ocr_spark.operators.textanalysis import (
    top_terms_per_source,
    top_terms_per_source_grouped_map,
)

SF = "/root/testdata/sf0.001"


def test_top_terms_variants_agree(spark):
    native = [tuple(r) for r in top_terms_per_source(spark, SF).collect()]
    demo = [tuple(r) for r in top_terms_per_source_grouped_map(spark, SF).collect()]
    assert native == demo
    assert len(native) > 0


def test_repetition_metrics_handles_sub_2_word_docs(spark, tmp_path):
    """Docs with <2 words (or empty text) must not crash the 2-gram
    branch (sequence(0,-1) + slice(_,0,2) used to throw) and report
    top_2gram_frac = 0 like the DuckDB oracle's len(words)>=2 guard."""
    from extract_ocr_spark.operators.textanalysis import repetition_metrics

    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        [(1, "hello", "en", "s", 5), (2, "", "en", "s", 0),
         (3, "two words", "en", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d))
    got = {r["doc_id"]: r for r in
           repetition_metrics(spark, str(tmp_path)).collect()}
    assert got[1]["top_2gram_frac"] == 0.0
    assert got[2]["top_2gram_frac"] == 0.0 and got[2]["n_lines"] == 0
    assert got[3]["top_2gram_frac"] == 1.0  # exactly one 2-gram


def test_lm_nll_scores_ranks_gibberish_above_common(spark, tmp_path):
    """The corpus-trained bigram LM must assign HIGHER avg negative
    log-likelihood (= less probable) to a doc of unique gibberish bigrams
    than to a doc made of the corpus's most repeated phrase."""
    from extract_ocr_spark.operators.textanalysis import lm_nll_scores

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common, "en", "s", 40) for i in range(20)]
    rows.append((100, "zxq vbnk wqpolr ajsnd fkelwm qoxuzy", "en", "s", 40))
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d))

    got = {r["doc_id"]: r["avg_nll"]
           for r in lm_nll_scores(spark, str(tmp_path)).collect()}
    assert got[100] > got[0] + 1.0  # gibberish clearly less probable
    assert all(got[i] == got[0] for i in range(1, 20))  # identical docs tie
