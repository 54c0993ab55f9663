"""Near-dup clustering (connected components) and quality-filter gates."""

from __future__ import annotations

from extract_ocr_spark.operators.curation import quality_filter_apply
from extract_ocr_spark.operators.dedup import neardup_clusters


def _write_documents(spark, tmp_path, rows):
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d))
    return str(tmp_path)


def test_neardup_clusters_transitive(spark, tmp_path):
    # a≈b and b≈c but a,c share less — transitivity must still cluster all
    # three to min id; d/e form a second cluster; f is a singleton.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (10, base + " one", "en", "s", 40),
        (11, base + " one", "en", "s", 40),          # = 10
        (12, base + " one extra", "en", "s", 40),    # ≈ 10/11
        (20, "foo bar baz qux quux corge grault garply", "en", "s", 40),
        (21, "foo bar baz qux quux corge grault waldo", "en", "s", 40),
        (30, "completely different text with nothing shared here at all",
         "en", "s", 40),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r["doc_id"]: r["cluster"] for r in neardup_clusters(spark, sf).collect()}
    assert got[10] == got[11] == 10
    # 12 clusters with 10 iff its jaccard >= 0.8 against either; whatever
    # the pair graph says, the component label must be the component min
    # and the singleton must self-label.
    assert got[30] == 30
    assert got[20] == got[21] == 20 or (got[20] == 20 and got[21] == 21)


def test_quality_filter_gates(spark, tmp_path):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 4, "en", "s", 0),
        (2, "xx", "en", "s", 0),                       # too short
        (3, "!!! ??? ;;; ::: ,,, " * 10, "en", "s", 0),  # punct-heavy
        (4, ("a " * 100).strip(), "en", "s", 0),       # mean word len 1 < 3
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in quality_filter_apply(spark, sf).collect()}
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["ok_len"] is False
    assert got[3]["keep"] is False and got[3]["ok_punct"] is False
    assert got[4]["keep"] is False and got[4]["ok_words"] is False


def test_connected_components_long_path_converges(spark):
    # A 25-node path graph (diameter 24 > the old 20-iteration cap, which
    # silently returned partial labels) must fully converge to comp=0 for
    # every node — pointer jumping makes this take O(log n) iterations.
    import pyspark.sql.functions as F

    from extract_ocr_spark.operators.dedup import connected_components

    n = 25
    fwd = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], "src long, dst long")
    labels = spark.range(n).select(
        F.col("id"), F.col("id").alias("comp"))
    got = {r["id"]: r["comp"]
           for r in connected_components(labels, edges).collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_raises_when_capped(spark):
    import pyspark.sql.functions as F
    import pytest

    from extract_ocr_spark.operators.dedup import connected_components

    n = 25
    fwd = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], "src long, dst long")
    labels = spark.range(n).select(F.col("id"), F.col("id").alias("comp"))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(labels, edges, max_iters=2)
