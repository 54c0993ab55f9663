"""Scale-safety tests for the dedup operators: stop-shingle frequency
cap (bounded join fan-out under boilerplate skew) and the O(n²)
exact-twin guard."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from extract_ocr_spark.operators import dedup


def _write_documents(spark, tmp_path, rows):
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d))
    return str(tmp_path)


BOILER = "all rights reserved contact us for details"


def test_hot_shingle_cap_drops_boilerplate_only_pairs(spark, tmp_path):
    # 1000 docs share one boilerplate sentence; unique payloads otherwise.
    # Without the df-cap the boilerplate shingles alone fan out ~500k join
    # rows per shingle and every doc pairs with every other.
    rows = [
        (i, f"{BOILER} unique{i} token{i} word{i} item{i}", "en", "s", 40)
        for i in range(1000)
    ]
    # plus one genuine near-dup pair sharing distinctive content
    rows += [
        (2000, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40),
        (2001, "alpha beta gamma delta epsilon zeta eta iota", "en", "s", 40),
    ]
    sf_dir = _write_documents(spark, tmp_path, rows)
    t0 = time.monotonic()
    pairs = dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    wall = time.monotonic() - t0
    ids = {(r["a_id"], r["b_id"]) for r in pairs}
    # The genuine pair survives (its shingles are rare)...
    assert (2000, 2001) in ids
    # ...and no boilerplate-only pair appears: their only shared shingles
    # have document frequency 1000 > SHINGLE_DF_CAP and are dropped.
    assert all(a >= 2000 for a, _ in ids), sorted(ids)[:5]
    # Bounded fan-out ⇒ comfortably fast even on the skewed corpus.
    assert wall < 120


def test_drop_hot_shingles_unit(spark):
    inv = spark.createDataFrame(
        [(i, "hot") for i in range(10)] + [(1, "rare"), (2, "rare")],
        "doc_id long, shingle string",
    )
    kept = dedup._drop_hot_shingles(inv, cap=5).collect()
    assert {r["shingle"] for r in kept} == {"rare"}
    assert len(kept) == 2


def test_exact_pair_guard_refuses_large_input(spark, tmp_path, monkeypatch):
    emb = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.1)] * 4).cast("array<float>").alias("embedding"),
        F.lit(0).alias("label"),
    )
    emb.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet"))
    monkeypatch.setattr(dedup, "MAX_EXACT_PAIR_ROWS", 5)
    with pytest.raises(ValueError, match="embedding_neardup_lsh"):
        dedup.embedding_neardup_pairs(spark, str(tmp_path))
