"""End-to-end spark-submit-shaped job tests: run jobs/*.py as real
subprocesses (own JVM, PYTHONPATH like --py-files would provide) over a
tiny corpus and check stage accounting + committed outputs."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(script: str, *argv: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", script), *argv],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, r.stdout[-2000:]
    return json.loads(lines[-1])


def test_curate_job_end_to_end(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = []
    # eval doc (id 0): distinctive content only — sharing `base` with the
    # corpus would make every doc legitimately contaminated
    rows.append((0, "benchmark answer key alpha beta gamma delta epsilon "
                    "zeta eta theta iota kappa lambdaword muword nuword "
                    "xiword omicron piword", "en", "wiki", 120))
    # normal keepable docs
    rows += [(i, f"{base} unique{i} extra{i} filler{i} more{i} text{i} "
                 f"words{i} here{i} now{i}", "en", "web", 120)
             for i in range(10, 40)]
    # exact duplicate pair (one survives dedup)
    rows.append((50, rows[1][1], "en", "web", 120))
    # repetitive doc (top-2gram ~1.0)
    rows.append((60, "spam " * 60, "en", "web", 120))
    # contaminated doc: shares the eval doc's distinctive content
    rows.append((70, "benchmark answer key alpha beta gamma delta epsilon "
                     "zeta eta theta iota kappa lambdaword muword nuword "
                     "xiword omicron piword and some tail", "en", "web", 120))
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    inp = str(tmp_path / "docs")
    docs.coalesce(2).write.parquet(inp)
    out = str(tmp_path / "out")

    stats = _run_job("curate_job.py", "--input", inp, "--output", out,
                     "--eval-ids", "0", "--min-shared-shingles", "5")
    assert stats["docs_in"] == len(rows)
    assert stats["after_dedup"] == len(rows) - 1      # the exact dup
    assert stats["repetitive_dropped"] >= 1           # the spam doc
    assert stats["contaminated_dropped"] >= 1         # doc 70
    assert stats["docs_out"] == stats["after_dedup"] - 1 \
        - stats["repetitive_dropped"] - stats["contaminated_dropped"]
    assert stats["train_sequences"] >= 1

    corpus = spark.read.parquet(f"{out}/corpus")
    got_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert 0 not in got_ids and 60 not in got_ids and 70 not in got_ids
    # every train doc carries its packed-sequence assignment
    train = corpus.filter(F.col("split") == "train")
    assert train.filter(F.col("seq_id").isNull()).count() == 0


def test_extract_job_end_to_end_with_audit_and_resume(spark, tmp_path):
    from extract_ocr_spark.datagen import synthetic_documents_df

    inp = str(tmp_path / "docs")
    synthetic_documents_df(spark, 30, seed=42, partitions=2) \
        .write.parquet(inp)
    out = str(tmp_path / "out")

    report = _run_job("extract_job.py", "--input", inp, "--output", out,
                      "--micro-batches", "2", "--audit")
    assert report["ok"] is True
    assert report["processed"] == 30
    assert report["missing_lineage"] == 0 and report["duplicate_lineage"] == 0

    # re-run over the same output dir: lineage anti-join skips everything,
    # the audit still holds, and nothing is processed twice
    report2 = _run_job("extract_job.py", "--input", inp, "--output", out,
                       "--micro-batches", "2", "--audit")
    assert report2["ok"] is True
    assert report2["processed"] == 30 and report2["duplicate_lineage"] == 0
    lineage = spark.read.parquet(f"{out}/lineage")
    assert lineage.count() == 30  # still exactly one event per doc


def test_curate_job_chunking_stage(spark, tmp_path):
    """--chunk-tokens: long documents come out as overlapping win/stride
    chunks (doc#chunk ids), every chunk within the token budget, source
    metadata carried, packing applied to the chunked rows."""
    # letter-only tokens: digit-suffixed words fail the alpha-ratio
    # quality gate and silently empty the corpus (the MIN_CHARS lesson)
    import itertools
    letters = "abcdefghijklmnopqrstuvwxyz"
    toks = ["w" + a + b for a, b in itertools.product(letters, letters)]
    long_text = " ".join(toks[:50])
    rows = [(i, long_text + " tail" + letters[i % 26], "en", "web", 300)
            for i in range(10, 16)]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    inp = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(inp)
    out = str(tmp_path / "out")

    stats = _run_job("curate_job.py", "--input", inp, "--output", out,
                     "--eval-ids", "", "--chunk-tokens", "16",
                     "--chunk-stride", "8")
    # 51 tokens at stride 8 -> ceil(51/8) = 7 chunks per doc
    assert stats["chunk_tokens"] == 16
    assert stats["docs_out"] == 7 * len(rows)

    corpus = spark.read.parquet(f"{out}/corpus")
    got = corpus.select("doc_id", "text", "source").collect()
    assert all("#" in r["doc_id"] for r in got)
    assert all(len(r["text"].split()) <= 16 for r in got)
    assert all(r["source"] == "web" for r in got)
    # overlapping stride: chunk 1 of a doc starts at token 8
    by_id = {r["doc_id"]: r["text"] for r in got}
    assert by_id["10#1"].split()[0] == toks[8]
    train = corpus.filter(F.col("split") == "train")
    assert train.filter(F.col("seq_id").isNull()).count() == 0


def test_curate_job_paragraph_dedup_stage(spark, tmp_path):
    """--paragraph-dedup: surviving docs are rewritten to their first-
    occurrence paragraphs; a doc whose every paragraph was already seen
    drops out entirely; exact dedup still runs first."""
    # 6-token blocks of letter-only 4-7 char words (pass every quality
    # gate; each 3-block doc is ~110 chars >= MIN_CHARS)
    A = "alpha beta gamma delta epsilon zeta"
    B = "ethics monad praxis quorum raster sonnet"
    C = "tundra umbrage velvet walnut xylem yonder"
    D = "zephyr anchor botany cipher dynamo enzyme"
    rows = [
        (10, f"{A} {B} {C}", "en", "web", 110),
        (11, f"{A} {B} {D}", "en", "web", 110),   # keeps only D
        (12, f"{A} {B} {C}", "en", "web", 110),   # exact dup of 10
        (13, f"{C} {A} {B}", "en", "web", 110),   # all paras seen → out
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    inp = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(inp)
    out = str(tmp_path / "out")

    stats = _run_job("curate_job.py", "--input", inp, "--output", out,
                     "--eval-ids", "", "--paragraph-dedup")
    assert stats["docs_in"] == 4
    assert stats["after_dedup"] == 3           # doc 12 exact-dropped first
    assert stats["paras_in"] == 9              # docs 10, 11, 13 × 3 blocks
    assert stats["paras_dropped"] == 5         # 11: A,B; 13: C,A,B
    assert stats["para_emptied_docs"] == 1     # doc 13
    assert stats["docs_out"] == 2

    corpus = spark.read.parquet(f"{out}/corpus")
    got = {int(r["doc_id"]): r["text"] for r in corpus.collect()}
    assert got[10] == f"{A} {B} {C}"
    assert got[11] == D
    assert set(got) == {10, 11}


def test_extract_job_via_real_spark_submit_py_files(spark, tmp_path):
    """The LITERAL north-rule invocation: `spark-submit --py-files
    extract_ocr_spark.zip jobs/extract_job.py` as a real subprocess —
    the package reaches driver AND executors only through the zip (no
    PYTHONPATH injection), master comes from spark-submit, and the
    committed output parquet reads back with every input doc extracted.
    Skips only if no spark-submit binary is on the box."""
    import shutil
    import zipfile

    from extract_ocr_spark.datagen import synthetic_documents_df

    submit = shutil.which("spark-submit") or (
        "/opt/spark/bin/spark-submit"
        if os.path.exists("/opt/spark/bin/spark-submit") else None)
    if submit is None:
        import pytest
        pytest.skip("no spark-submit binary available")

    inp = str(tmp_path / "docs")
    synthetic_documents_df(spark, 60, seed=7).coalesce(2).write.parquet(inp)
    out = str(tmp_path / "out")

    zpath = tmp_path / "extract_ocr_spark.zip"
    pkg = os.path.join(REPO, "extract_ocr_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    r = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", str(zpath),
         os.path.join(REPO, "jobs", "extract_job.py"),
         "--input", inp, "--output", out, "--micro-batches", "2"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=420)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, r.stdout[-2000:]
    stats = json.loads(lines[-1])
    assert stats["batches_done"] == 2, stats

    extracted = spark.read.parquet(f"{out}/extracted")
    assert extracted.select("doc_id").distinct().count() == 60


def test_compact_job_plans_and_levels_files(spark, tmp_path):
    """Small-file compaction: 200 tiny files in, the PLANNED number of
    ~target-sized files out (ceil(bytes/target), pinned against the
    job's own reported input bytes), sizes level within 2x, rows
    preserved."""
    from jobs.compact_job import plan_output_files, run

    src = str(tmp_path / "small")
    docs = spark.range(40_000).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    docs.repartition(200).write.parquet(src)

    out = str(tmp_path / "compacted")
    stats = run(spark, src, out, target_mb=1)
    assert stats["files_in"] >= 200, stats
    assert stats["planned_files"] == plan_output_files(stats["bytes_in"], 1)
    assert stats["files_out"] == stats["planned_files"], stats
    assert 1 < stats["files_out"] < 20, stats

    sizes = [os.path.getsize(os.path.join(out, f))
             for f in os.listdir(out) if f.endswith(".parquet")]
    assert max(sizes) < 2 * min(sizes), sizes  # round-robin levels sizes
    assert spark.read.parquet(out).count() == 40_000


def test_compact_job_sorted_layout_has_disjoint_file_ranges(spark,
                                                            tmp_path):
    """--sort-by compaction: the output is range-partitioned, so file
    footer min/max ranges on the key are pairwise DISJOINT (a range scan
    then opens exactly the overlapping files)."""
    from jobs.compact_job import run

    from tests.test_scale_layout import _footer_ranges

    src = str(tmp_path / "small")
    spark.range(40_000).select(
        (F.col("id") * 37 % 40_000).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    ).repartition(100).write.parquet(src)

    out = str(tmp_path / "sorted")
    stats = run(spark, src, out, target_mb=1, sort_by="k")
    assert stats["layout"] == "range"
    ranges = sorted(_footer_ranges(out, "k"))
    assert len(ranges) == stats["files_out"] > 1
    for (_, prev_hi), (lo, _) in zip(ranges, ranges[1:]):
        assert lo > prev_hi, ranges
    assert spark.read.parquet(out).count() == 40_000


def test_datacard_job_end_to_end(spark, tmp_path):
    """The data-card job must publish every section as parquet, report
    row counts matching the registry queries it composes (the card can
    never drift from the oracle-checked surface), and fail fast on an
    unknown section name."""
    import pytest

    from jobs import datacard_job

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "card")
    stats = datacard_job.run(spark, sf, out)
    assert set(stats["sections"]) == {
        "corpus", "cube", "length_exact", "length_sketch", "chi2", "ks",
        "mixture"}

    from extract_ocr_spark.operators import curation, textanalysis

    want = {
        "corpus": curation.corpus_report,
        "cube": curation.cube_report,
        "length_exact": curation.length_quantiles,
        "length_sketch": curation.hdr_quantiles,
        "chi2": textanalysis.chi2_drift,
        "ks": textanalysis.ks_drift,
        "mixture": curation.mixture_weights,
    }
    for name, fn in want.items():
        assert stats["sections"][name]["rows"] == fn(spark, sf).count()
        got = spark.read.parquet(f"{out}/{name}")
        assert got.count() == stats["sections"][name]["rows"]
        # parquet round-trip relaxes non-null flags; names+types must hold
        assert [(f.name, f.dataType) for f in got.schema.fields] == \
            [(f.name, f.dataType) for f in fn(spark, sf).schema.fields]

    with pytest.raises(ValueError, match="unknown data-card sections"):
        datacard_job.run(spark, sf, out, sections=["corpus", "typo"])


def test_datacard_job_via_subprocess_section_subset(tmp_path):
    """spark-submit-shaped subprocess run over a section subset: only
    the requested tables are written and the summary carries them."""
    out = str(tmp_path / "card")
    stats = _run_job(
        "datacard_job.py", "--input", "/root/testdata/sf0.001",
        "--output", out, "--sections", "corpus,chi2")
    assert set(stats["sections"]) == {"corpus", "chi2"}
    assert os.path.isdir(f"{out}/corpus") and os.path.isdir(f"{out}/chi2")
    assert not os.path.exists(f"{out}/cube")
    assert stats["sections"]["corpus"]["rows"] > 0


def test_datacard_job_rejects_empty_section_list(spark, tmp_path):
    import pytest

    from jobs import datacard_job

    with pytest.raises(ValueError, match="no data-card sections"):
        datacard_job.run(spark, "/root/testdata/sf0.001",
                         str(tmp_path / "card"), sections=[])


def test_ann_index_job_build_query_matches_inline(spark, tmp_path):
    """The materialized-index parity contract: build + query over the
    same embeddings equals the inline ``ann_topk_ivfpq`` row-for-row,
    and the serve-side scan turns probe pruning into real PARTITION
    pruning (PartitionFilters on ``cell`` — unprobed cells' files are
    never opened)."""
    import sys as _sys
    _sys.path.insert(0, os.path.join(REPO, "jobs"))
    from ann_index_job import build, query

    from extract_ocr_spark.operators.similarity import ann_topk_ivfpq

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "idx")
    stats = build(spark, f"{sf}/embeddings.parquet", idx)
    n = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert stats["n_vectors"] == n
    assert stats["codebook_entries"] == 64  # M=4 × K=16

    served = query(spark, f"{sf}/embeddings.parquet", idx)
    got = [(r["vec_id"], r["label"], r["approx_d2"])
           for r in served.collect()]
    want = [(r["vec_id"], r["label"], r["approx_d2"])
            for r in ann_topk_ivfpq(spark, sf).collect()]
    assert got == want and len(got) == 10

    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "cell" in pf and " IN " in pf, pf


def test_ann_index_job_via_subprocess(tmp_path):
    """The real CLI: build then query as spark-submit-shaped
    subprocesses; the query's printed top-1 must be a plausible
    (vec_id, label, approx_d2) triple with BIGINT distance."""
    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "idx")
    stats = _run_job("ann_index_job.py", "--mode", "build",
                     "--embeddings", f"{sf}/embeddings.parquet",
                     "--index", idx)
    assert stats["mode"] == "build" and stats["n_vectors"] > 0
    out = _run_job("ann_index_job.py", "--mode", "query",
                   "--embeddings", f"{sf}/embeddings.parquet",
                   "--index", idx, "--vec-id", "0")
    assert out["mode"] == "query" and len(out["results"]) == 10
    vid, label, d2 = out["results"][0]
    assert isinstance(vid, int) and isinstance(d2, int) and d2 >= 0


def test_eval_job_end_to_end(spark, tmp_path):
    """The eval job must publish every section as parquet, report row
    counts matching the registry queries it composes (the panel can
    never drift from the oracle-checked surface), and fail fast on an
    unknown section name or an empty selection."""
    import pytest

    from jobs import eval_job

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "evals")
    stats = eval_job.run(spark, sf, out)
    assert set(stats["sections"]) == {
        "auc", "pr", "calibration", "confusion", "ndcg", "mrr", "rrf"}

    from extract_ocr_spark.operators import similarity, textanalysis

    want = {
        "auc": textanalysis.classifier_auc,
        "pr": textanalysis.pr_curve,
        "calibration": textanalysis.calibration_bins,
        "confusion": textanalysis.nb_lang_confusion,
        "ndcg": similarity.ndcg_eval,
        "mrr": similarity.mrr_eval,
        "rrf": similarity.rrf_fusion,
    }
    for name, fn in want.items():
        assert stats["sections"][name]["rows"] == fn(spark, sf).count()
        got = spark.read.parquet(f"{out}/{name}")
        assert got.count() == stats["sections"][name]["rows"]
        assert [(f.name, f.dataType) for f in got.schema.fields] == \
            [(f.name, f.dataType) for f in fn(spark, sf).schema.fields]

    with pytest.raises(ValueError, match="unknown eval sections"):
        eval_job.run(spark, sf, out, sections=["auc", "typo"])
    with pytest.raises(ValueError, match="no eval sections"):
        eval_job.run(spark, sf, out, sections=[])


def test_eval_job_via_subprocess_section_subset(tmp_path):
    """spark-submit-shaped subprocess run over a section subset: only
    the requested tables are written."""
    out = str(tmp_path / "evals")
    stats = _run_job(
        "eval_job.py", "--input", "/root/testdata/sf0.001",
        "--output", out, "--sections", "mrr,confusion")
    assert set(stats["sections"]) == {"mrr", "confusion"}
    assert os.path.isdir(f"{out}/mrr") and os.path.isdir(f"{out}/confusion")
    assert not os.path.exists(f"{out}/auc")
    assert stats["sections"]["mrr"]["rows"] > 0
