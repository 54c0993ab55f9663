"""Semantics pins for paragraph_dedup (CCNet-style keep-first) and
winnow_fingerprints (MOSS winnowing): tiny hand-built corpora plus a pure
python reference of the winnowing rule. Oracle parity for both is covered
by the parametrized test_entry_oracles sweep."""

from __future__ import annotations

import hashlib

from extract_ocr_spark.operators.curation import paragraph_dedup
from extract_ocr_spark.operators.textanalysis import (
    WIN_K,
    WIN_W,
    winnow_fingerprints,
)


def _write_documents(spark, tmp_path, rows):
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d))
    return str(tmp_path)


BLOCK_X = "x1 x2 x3 x4 x5 x6"
BLOCK_Y = "y1 y2 y3 y4 y5 y6"
BLOCK_Z = "z1 z2 z3 z4 z5 z6"
BLOCK_W = "w1 w2 w3 w4 w5 w6"


def test_paragraph_dedup_keep_first(spark, tmp_path):
    rows = [
        # doc 1 defines X and Y — first occurrence corpus-wide
        (1, f"{BLOCK_X} {BLOCK_Y}", "en", "s", 35),
        # doc 2 repeats X (dropped) then introduces Z (kept)
        (2, f"{BLOCK_X} {BLOCK_Z}", "en", "s", 35),
        # doc 3 duplicates a block INSIDE itself — second copy dropped
        (3, f"{BLOCK_W} {BLOCK_W}", "en", "s", 35),
        # doc 4 is empty — still present with zero paragraphs
        (4, "", "en", "s", 0),
        # doc 5: repeated Y (dropped) + a 2-token partial tail (kept —
        # a partial block never hash-collides with a full one)
        (5, f"{BLOCK_Y} t1 t2", "en", "s", 25),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in paragraph_dedup(spark, sf).collect()}
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (2, 2)
    assert got[1]["text_kept"] == f"{BLOCK_X} {BLOCK_Y}"
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (2, 1)
    assert got[2]["text_kept"] == BLOCK_Z
    assert (got[3]["n_paras"], got[3]["n_kept"]) == (2, 1)
    assert got[3]["text_kept"] == BLOCK_W
    assert (got[4]["n_paras"], got[4]["n_kept"], got[4]["text_kept"]) == (
        0, 0, "")
    assert (got[5]["n_paras"], got[5]["n_kept"]) == (2, 1)
    assert got[5]["text_kept"] == "t1 t2"


def test_paragraph_dedup_case_insensitive_hash_case_preserving_text(
        spark, tmp_path):
    # The dedup KEY is case-folded but kept text is NOT rewritten: doc 2's
    # uppercase copy of X dedups against doc 1's lowercase original, and
    # doc 1 keeps its original casing ("The" stays "The").
    rows = [
        (1, "The Quick Brown Fox Jumps Over " + BLOCK_Y, "en", "s", 60),
        (2, "the quick brown fox jumps over " + BLOCK_Z, "en", "s", 60),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in paragraph_dedup(spark, sf).collect()}
    assert got[1]["text_kept"] == "The Quick Brown Fox Jumps Over " + BLOCK_Y
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (2, 1)
    assert got[2]["text_kept"] == BLOCK_Z


def _py_winnow(text: str) -> set[tuple[int, int]]:
    """Pure-python reference of the exact rule: leftmost-min (fp, pos)
    per window of WIN_W gram positions; window starts are 0 and every
    s <= n_grams - WIN_W."""
    toks = [t for t in text.lower().split() if t]
    if len(toks) < WIN_K:
        return set()
    grams = [" ".join(toks[i:i + WIN_K]) for i in range(len(toks) - WIN_K + 1)]
    fps = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    starts = {0} | set(range(0, len(grams) - WIN_W + 1))
    out = set()
    for s in starts:
        window = [(fps[i], i) for i in range(s, min(s + WIN_W, len(grams)))]
        out.add(min(window))
    return {(p, f) for f, p in out}


def test_winnow_matches_python_reference(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a b",                      # < k tokens → no fingerprints
        "p q r s",                  # exactly one gram → pos 0 selected
        " ".join(f"tok{i % 7}" for i in range(40)),  # periodic → dup grams
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    sf = _write_documents(spark, tmp_path, rows)
    got: dict[int, set] = {}
    for r in winnow_fingerprints(spark, sf).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_winnow(t), f"doc {i}"


def test_winnow_shared_run_guarantee(spark, tmp_path):
    # Any shared run of w + k - 1 tokens must produce >= 1 shared
    # fingerprint VALUE (the winnowing guarantee) — here at different
    # offsets in two otherwise-different docs.
    run = " ".join(f"shared{i}" for i in range(WIN_W + WIN_K - 1))
    rows = [
        (1, f"alpha beta gamma {run} delta epsilon", "en", "s", 99),
        (2, f"{run} omega psi chi phi upsilon tau sigma", "en", "s", 99),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    fps: dict[int, set] = {1: set(), 2: set()}
    for r in winnow_fingerprints(spark, sf).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2], "no shared fingerprint for a shared 7-token run"


def test_boilerplate_lines_removes_all_copies_unlike_dedup(spark, tmp_path):
    """The frequency filter removes EVERY copy of a templated
    paragraph (df >= BOILER_MIN_DF) — including the first occurrence
    that paragraph_dedup would keep — while below-threshold repeats
    survive everywhere."""
    from extract_ocr_spark.operators.curation import (
        boilerplate_lines_df,
        paragraph_dedup_df,
    )

    banner = "accept all cookies to continue browsing"  # exactly 6 tokens
    # = exactly ONE paragraph block (PARA_TOKENS = 6); a longer banner
    # would split into 2 blocks and the n_dropped == 1 asserts below
    # would no longer hold
    uniq = ["alpha beta gamma delta epsilon zeta",
            "one two three four five six",
            "red green blue cyan magenta yellow"]
    rows = [
        (1, f"{banner} {uniq[0]}", "en", "s", 80),
        (2, f"{banner} {uniq[1]}", "en", "s", 80),
        (3, f"{banner} {uniq[2]}", "en", "s", 80),   # banner df = 3
        (4, f"{uniq[0]}", "en", "s", 40),            # uniq[0] df = 2 only
        (5, banner, "en", "s", 40),                  # boilerplate-only doc
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")

    got = {r["doc_id"]: r for r in boilerplate_lines_df(docs).collect()}
    # the banner block disappears from every doc, even the first
    for i in (1, 2, 3):
        assert got[i]["n_dropped"] == 1, got[i]
        assert banner not in got[i]["text_kept"], got[i]
    # df=2 paragraph survives in both its docs
    assert uniq[0] in got[1]["text_kept"] and uniq[0] in got[4]["text_kept"]
    # a boilerplate-only doc empties out
    assert got[5]["text_kept"] == "" and got[5]["n_dropped"] == 1
    # contrast: paragraph_dedup KEEPS the first banner occurrence
    dd = {r["doc_id"]: r for r in paragraph_dedup_df(docs).collect()}
    assert banner in dd[1]["text_kept"]
    assert banner not in dd[2]["text_kept"]
