"""Physical-layout scale evidence: the two cluster-side mechanisms the
100 TB story leans on beyond per-query plan shapes —

- BUCKETED TABLES: co-partitioned storage makes repeated key-joins
  shuffle-free. At 10^12 docs the doc_id joins (manifest ⋈ raw,
  lineage ⋈ extracted, features ⋈ labels) run nightly; bucketing both
  sides once turns every one of them into a zero-exchange sort-merge
  join. Pinned: a bucketed-both-sides equi join executes with ZERO
  Exchange operators.
- AQE SKEW-JOIN: a hot key (the '/shared' anchor target, the empty-text
  sha, the stopword bigram) concentrates one shuffle partition; AQE
  splits it at runtime. Pinned: a 90%-hot-key join's final adaptive
  plan contains skew=true splits, so the mitigation the operator
  docstrings cite is demonstrably ACTIVE in this session's config
  (session.py sets spark.sql.adaptive.skewJoin.enabled).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture
def restore_conf(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    yield
    for k, v in saved.items():
        if v is not None:
            spark.conf.set(k, v)
        else:
            spark.conf.unset(k)


def test_bucketed_join_runs_with_zero_exchanges(spark, tmp_path,
                                                restore_conf):
    """Both sides bucketed on the join key with equal bucket counts →
    the sort-merge join needs NO shuffle at all (bucketing satisfies the
    join's distribution requirement from storage)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("x"))
    meta = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("y"))
    try:
        for name, df in (("t_docs_bkt", docs), ("t_meta_bkt", meta)):
            (df.write.mode("overwrite")
             .option("path", str(tmp_path / name))
             .bucketBy(8, "doc_id").sortBy("doc_id")
             .format("parquet").saveAsTable(name))
        j = spark.table("t_docs_bkt").join(spark.table("t_meta_bkt"),
                                           "doc_id")
        # execute THIS DataFrame's plan (count() finalizes a different
        # query's adaptive plan — the skew test's lesson applies here too)
        assert len(j.collect()) == 10_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=false" not in plan, plan
        assert plan.count("Exchange") == 0, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        for name in ("t_docs_bkt", "t_meta_bkt"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_aqe_splits_skewed_join_partition(spark, restore_conf):
    """A 90%-hot-key fact ⋈ dim join must show AQE's runtime skew split
    (skew=true) in the FINAL adaptive plan — proving the skew mitigation
    the operator docstrings rely on is live, not just configured."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                   "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id"))
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    dim = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("z"))
    sj = fact.join(dim, "k")
    # execute THIS DataFrame's plan (count() would run a different query
    # whose own AQE plan is the one finalized)
    assert len(sj.collect()) == 200_000
    plan = sj._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "skew=true" in plan, plan


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on the partition column must prune at PLANNING time:
    the scan's PartitionFilters carries the predicate and only the
    matching partition directory is read (at 10^12 docs, day/source
    partitioning is what turns full-corpus scans into single-digit
    percents)."""
    from pyspark.sql import functions as F

    src = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("day"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    path = str(tmp_path / "parts")
    src.write.partitionBy("day").parquet(path)
    q = spark.read.parquet(path).filter(F.col("day") == 3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert "(day" in plan.split("PartitionFilters", 1)[1][:120], plan
    assert q.count() == 10_000 // 7 + (1 if 3 < 10_000 % 7 else 0)
    # the data filter must NOT appear as a post-scan Filter on payload
    assert q.count() == len(q.collect())


def _footer_ranges(path, col):
    """Per-file (min, max) of a column from the parquet footers — the
    exact statistics a scan's file-skipping consults."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def test_zorder_write_prunes_files_on_both_dimensions(spark, tmp_path):
    """The Z-order layout claim, proven from real parquet footer stats:
    after `zorder_write` on (x, y), a narrow range predicate on EITHER
    column overlaps only a small fraction of files, while the
    single-column-sorted layout prunes nothing on the other dimension
    (every file's y range spans the whole domain). This is what makes
    the interleaved key worth computing at 100 TB: one layout serves
    both predicate families."""
    from extract_ocr_spark.operators.layout import zorder_write

    n, files = 256, 16
    grid = (spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long")
        .alias("y")))

    lin_path, z_path = str(tmp_path / "linear"), str(tmp_path / "zorder")
    (grid.repartitionByRange(files, "x").sortWithinPartitions("x")
     .write.parquet(lin_path))
    zorder_write(grid, ("x", "y"), z_path, files)

    def overlapping(path, col, lo, hi):
        return sum(1 for (mn, mx) in _footer_ranges(path, col)
                   if not (mx < lo or mn > hi))

    # y in [16, 31] — 1/16 of the domain
    assert overlapping(lin_path, "y", 16, 31) == files  # no pruning at all
    z_y = overlapping(z_path, "y", 16, 31)
    assert z_y <= files // 2, z_y
    # x predicates must ALSO prune on the z layout (both dims at once)
    z_x = overlapping(z_path, "x", 16, 31)
    assert z_x <= files // 2, z_x
    # and the layout is lossless
    assert spark.read.parquet(z_path).count() == n * n

    # the Hilbert layout must give the same both-dimension pruning (its
    # regions are at least as compact — no quadrant-boundary jumps)
    from extract_ocr_spark.operators.layout import hilbert_write

    h_path = str(tmp_path / "hilbert")
    hilbert_write(grid, ("x", "y"), h_path, files)
    assert overlapping(h_path, "y", 16, 31) <= files // 2
    assert overlapping(h_path, "x", 16, 31) <= files // 2
    assert spark.read.parquet(h_path).count() == n * n


def test_hilbert_key_matches_classic_xy2d():
    """Pin the unrolled CASE/shift recurrence against the classic
    iterative xy2d reference (Hilbert curve, Wikipedia formulation) on a
    deterministic sample, plus bijectivity on a full sub-grid."""
    import pandas as pd

    from extract_ocr_spark.operators.layout import hilbert_select
    from extract_ocr_spark.session import get_spark

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    spark = get_spark("local[4]", shuffle_partitions=8)
    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)]
    sdf = hilbert_select(
        spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"])),
        F.col("x").cast("long"), F.col("y").cast("long"))
    got = {(r["x"], r["y"]): r["hkey"] for r in sdf.collect()}
    assert all(got[(x, y)] == xy2d(256, x, y) for x, y in pts)

    full = [(x, y) for x in range(32) for y in range(32)]
    keys = [r["hkey"] for r in hilbert_select(
        spark.createDataFrame(pd.DataFrame(full, columns=["x", "y"])),
        F.col("x").cast("long"), F.col("y").cast("long")).collect()]
    assert len(set(keys)) == len(full)


def test_column_pruning_reaches_scan(spark, tmp_path):
    """A two-column projection over a wide table must push column
    pruning into the parquet ReadSchema — a scan that reads all columns
    for a 2-column projection is wrong at any scale."""
    from pyspark.sql import functions as F

    src = spark.range(1_000).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
        (F.col("id") % 5).alias("lang"),
        (F.col("id") % 9).alias("source"),
        (F.col("id") * 3).alias("n_chars"))
    path = str(tmp_path / "wide")
    src.write.parquet(path)
    q = spark.read.parquet(path).select("doc_id", "lang")
    plan = q._jdf.queryExecution().executedPlan().toString()
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "doc_id" in rs and "lang" in rs, rs
    assert "text" not in rs and "n_chars" not in rs, rs


def test_dynamic_partition_pruning_active(spark, tmp_path):
    """Runtime partition pruning: joining a day-partitioned fact against
    a FILTERED dim must inject a dynamicpruningexpression into the fact
    scan's PartitionFilters — the dim's surviving day values prune fact
    partitions at RUNTIME, not just static literals at planning time. At
    10^12 docs this is what keeps star-join scans proportional to the
    dim selectivity (0 static predicates exist on the fact)."""
    fact = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("day"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    fact.write.partitionBy("day").parquet(str(tmp_path / "fact"))
    spark.range(50).select(
        F.col("id").alias("day"), (F.col("id") % 7).alias("dow"),
    ).write.parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("dow") == 3)
    j = f.join(d, "day")
    assert j.count() == 100_000 // 50 * 7  # 7 of 50 days survive
    plan = j._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2, plan
    assert "dynamicpruningexpression" in pf[1][:300], pf[1][:300]
