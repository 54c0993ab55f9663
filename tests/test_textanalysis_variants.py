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


def test_chunk_documents_windows_and_tail(spark):
    """25 tokens at win=10/stride=5 → starts 0,5,10,15,20 with the last
    two chunks clamped at the tail; text reconstructs from the tokens."""
    from extract_ocr_spark.operators.textanalysis import chunk_documents_df

    words = [f"w{i}" for i in range(25)]
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string")
    got = chunk_documents_df(docs, win=10, stride=5).collect()
    assert [(r["chunk_id"], r["chunk_tokens"]) for r in got] == [
        (0, 10), (1, 10), (2, 10), (3, 10), (4, 5)]
    assert got[0]["chunk_text"] == " ".join(words[:10])
    assert got[3]["chunk_text"] == " ".join(words[15:25])
    assert got[4]["chunk_text"] == " ".join(words[20:25])


def test_chunk_documents_short_doc_single_chunk(spark):
    from extract_ocr_spark.operators.textanalysis import chunk_documents_df

    docs = spark.createDataFrame(
        [(7, "just three words")], "doc_id long, text string")
    got = chunk_documents_df(docs, win=10, stride=5).collect()
    assert len(got) == 1
    assert (got[0]["chunk_id"], got[0]["chunk_tokens"],
            got[0]["chunk_text"]) == (0, 3, "just three words")


def test_bm25_prefers_higher_tf_and_shorter_docs(spark):
    """Okapi ordering sanity: more query-term hits beats fewer; at equal
    tf the shorter document scores higher (length normalization)."""
    from extract_ocr_spark.operators.similarity import bm25_search_df

    filler = " ".join(["pad"] * 40)
    docs = spark.createDataFrame(
        [
            (1, "spark join window " + filler),     # all three terms
            (2, "spark spark " + filler),           # tf=2, one term
            (3, "spark " + filler),                 # tf=1, long
            (4, "spark pad pad"),                   # tf=1, short
            (5, filler),                            # no hit
        ],
        "doc_id long, text string")
    got = bm25_search_df(docs).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert 5 not in by_id  # zero-hit docs never surface
    assert by_id[1]["n_terms_hit"] == 3
    assert by_id[1]["score"] > by_id[2]["score"] > by_id[3]["score"]
    assert by_id[4]["score"] > by_id[3]["score"]  # shorter doc wins at tf=1


def test_quality_classifier_matches_python_oracle(spark):
    """Score = mean hashed-bucket weight over tokens, computed exactly
    (BIGINT sum, one final division) — verified against a from-scratch
    python re-derivation including case folding and token filtering."""
    import hashlib

    from extract_ocr_spark.operators.textanalysis import (
        QC_BUCKETS, quality_classifier_df)

    texts = {
        1: "The quick brown Fox jumps over the LAZY dog",
        2: "spark   spark\tspark\n join window",
        3: "   ",          # whitespace-only: no tokens, row dropped
        4: "one-token",
        5: "a\x0Bb c",     # vertical tab IS a separator (python .split()
                           # and the explicit WS class agree; RE2 \s would
                           # not — the engine-invariance the class buys)
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_classifier_df(docs).collect()}

    def weight(tok: str) -> int:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        return (h % QC_BUCKETS) % 1001 - 500

    assert 3 not in got
    for doc_id, text in texts.items():
        toks = [t for t in text.lower().split() if t]
        if not toks:
            continue
        sw = sum(weight(t) for t in toks)
        score = round(sw / (500.0 * len(toks)), 6)
        row = got[doc_id]
        assert row["n_tok"] == len(toks)
        assert row["score"] == score
        assert row["keep"] == (score >= 0.0)


def test_quality_classifier_case_folds(spark):
    from extract_ocr_spark.operators.textanalysis import quality_classifier_df

    docs = spark.createDataFrame(
        [(1, "Hello WORLD"), (2, "hello world")], "doc_id long, text string")
    rows = quality_classifier_df(docs).collect()
    assert rows[0]["score"] == rows[1]["score"]


def test_char_entropy_known_values(spark, tmp_path):
    """Entropy pinned against hand-computed distributions: uniform
    2-symbol text = ln 2, single-char runs = 0, empty docs report 0/0."""
    import math

    from extract_ocr_spark.operators.textanalysis import char_entropy

    rows = [
        (1, "abab", "en", "s", 4),      # p(a)=p(b)=0.5 → ln 2
        (2, "aaaa", "en", "s", 4),      # single symbol → 0
        (3, "", "en", "s", 0),          # empty → n=0, entropy 0
        (4, "abcd", "en", "s", 4),      # uniform 4-symbol → ln 4
    ]
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d))
    got = {r["doc_id"]: r for r in char_entropy(spark, str(tmp_path)).collect()}
    assert got[1]["entropy_nats"] == round(math.log(2), 4)
    assert (got[2]["n_chars_counted"], got[2]["entropy_nats"]) == (4, 0.0)
    assert (got[3]["n_chars_counted"], got[3]["entropy_nats"]) == (0, 0.0)
    assert got[4]["entropy_nats"] == round(math.log(4), 4)


def test_kmv_distinct_python_mirror(spark, tmp_path):
    """KMV estimate pinned against a pure-python mirror of the exact
    rule (md5 60-bit hashes, k-th smallest, (k-1)*2^60/h_k), plus the
    not-full case returning the exact count."""
    import hashlib

    from extract_ocr_spark.operators.textanalysis import (
        KMV_K,
        kmv_distinct,
    )

    # source "big": 40 tokens -> ~1500 distinct bigrams (sketch full);
    # source "tiny": 10 tokens -> 9 bigrams (sketch not full)
    big_toks = [f"w{i}" for i in range(40)]
    big_texts = [" ".join(big_toks[i % 7:] + big_toks[:i % 7])
                 for i in range(50)]
    rows = [(i, t, "en", "big", len(t)) for i, t in enumerate(big_texts)]
    rows.append((99, " ".join(f"t{i}" for i in range(10)), "en", "tiny", 40))
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d))

    def py_kmv(texts):
        bgs = set()
        for t in texts:
            toks = t.lower().split()
            bgs |= {f"{a} {b}" for a, b in zip(toks, toks[1:])}
        hs = sorted(int(hashlib.md5(bg.encode()).hexdigest()[:15], 16)
                    for bg in bgs)
        if len(hs) < KMV_K:
            return len(bgs), float(len(bgs))
        return len(bgs), round(float((KMV_K - 1) << 60) / hs[KMV_K - 1], 4)

    got = {r["source"]: r for r in kmv_distinct(spark, str(tmp_path)).collect()}
    for src, texts in (("big", big_texts), ("tiny", [rows[-1][1]])):
        exact, est = py_kmv(texts)
        assert got[src]["exact_distinct"] == exact, src
        assert got[src]["kmv_estimate"] == est, src
    assert got["tiny"]["kmv_estimate"] == got["tiny"]["exact_distinct"]


def test_gopher_rules_line_and_word_gates(spark, tmp_path):
    """Crafted corpus exercising every Gopher rule the sf tables can't
    (they have no newlines): bullet-started lines, ellipsis-ended lines,
    symbol ratio, alpha-word fraction, stopword gate, word-count bounds.
    """
    from extract_ocr_spark.operators.textanalysis import gopher_rules

    good = ("the quick brown fox and the lazy dog have decided to run "
            "off with a caravan of fifty other animals that wander the "
            "wide open plains looking for water food shelter and the "
            "company of friendly creatures under a warm evening sky "
            "while singing songs about distant tall mountain ranges")  # 50
    bullets = "\n".join(f"- item {i}" for i in range(10))
    ellipses = "\n".join(f"line {i}..." for i in range(10))
    hashes = "the " + "# " * 30  # 31 words, 30 '#'
    numeric = "the of " + " ".join(str(i) for i in range(60))
    short = "the cat sat of"
    d = tmp_path / "documents.parquet"
    rows = [(1, good), (2, bullets), (3, ellipses), (4, hashes),
            (5, numeric), (6, short), (7, "")]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d))

    got = {r["doc_id"]: r.asDict()
           for r in gopher_rules(spark, str(tmp_path)).collect()}

    assert got[1]["keep"] and got[1]["n_words"] == 50
    assert got[1]["stop_hits"] >= 2 and got[1]["symbols"] == 0

    # every line bullet-started -> bullet fraction 1.0 > 0.9 -> drop
    assert got[2]["bullet_lines"] == 10 and got[2]["n_lines"] == 10
    assert not got[2]["keep"]

    # every line ellipsis-ended -> fraction 1.0 > 0.3 -> drop
    assert got[3]["ellipsis_lines"] == 10 and not got[3]["keep"]

    # 30 '#' over 31 words -> symbol ratio ~0.97 > 0.1 -> drop
    assert got[4]["symbols"] == 30 and not got[4]["keep"]

    # 60/62 words are digits -> alpha fraction < 0.8 -> drop
    assert got[5]["alpha_words"] == 2 and not got[5]["keep"]

    # under the 50-word floor -> drop (even with 2 stopword hits)
    assert got[6]["n_words"] == 4 and got[6]["stop_hits"] == 2
    assert not got[6]["keep"]

    # empty text: 0 words, 1 line ([''] split artifact), drop
    assert got[7]["n_words"] == 0 and got[7]["n_lines"] == 1
    assert not got[7]["keep"]


def test_containment_catches_what_jaccard_misses(spark, tmp_path):
    """A short doc fully embedded in a much longer one: overlap
    coefficient 1.0 (flagged) while its Jaccard sits far below that
    query's 0.5 threshold — the asymmetric case containment exists for."""
    from extract_ocr_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"          # 4 shingles
    filler = " ".join(f"word{i} item{i} thing{i}" for i in range(30))
    rows = [
        (1, short, "en", "s", 0),
        (2, short + " " + filler, "en", "s", 0),   # contains all of 1
        (3, "completely different text with nothing shared here at all",
         "en", "s", 0),
    ]
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d))

    got = {(r["a_id"], r["b_id"]): r["overlap"]
           for r in containment_pairs(spark, str(tmp_path)).collect()}
    assert got == {(1, 2): 1.0}
    jac = {(r["a_id"], r["b_id"])
           for r in ngram_jaccard_pairs(spark, str(tmp_path)).collect()}
    assert (1, 2) not in jac  # jaccard structurally misses it


def test_tfidf_top_terms_surface_distinctive_words(spark, tmp_path):
    """Terms shared by every doc score ln(N/N)=0; each doc's unique
    keywords outrank them and fill the top-k."""
    from extract_ocr_spark.operators.textanalysis import tfidf_top_terms

    filler = "the data engine runs fast"
    rows = [(i, filler + f" special{i} unique{i} rare{i}", "en", "s", 0)
            for i in range(4)]
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d))

    out = tfidf_top_terms(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["term"])
    assert by_doc[0] == {"special0", "unique0", "rare0"}
    assert by_doc[3] == {"special3", "unique3", "rare3"}
    assert all(r["tfidf"] > 0 for r in out)


def test_inverted_index_postings_and_cap(spark):
    """Posting lists match a hand replay; a phrase hotter than
    IDX_DF_CAP never surfaces (pruned before any posting materializes)
    and singletons are dropped."""
    from extract_ocr_spark.operators.textanalysis import (
        IDX_DF_CAP,
        inverted_index_df,
    )

    rows = [(i, "alpha beta gamma", "en", "s", 0) for i in range(5)]
    rows += [(100 + i, "hot hot extra", "en", "s", 0)
             for i in range(IDX_DF_CAP + 5)]
    rows += [(900, "lonely phrase here", "en", "s", 0)]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")

    got = {r["term"]: (r["df"], r["postings"])
           for r in inverted_index_df(docs).collect()}
    assert got["alpha beta"] == (5, "0,1,2,3,4")
    assert got["beta gamma"] == (5, "0,1,2,3,4")
    assert "hot hot" not in got       # df = 35 > cap, pruned pre-postings
    assert "hot extra" not in got     # df = 35 > cap as well
    assert "lonely phrase" not in got  # df = 1 < min


def test_pmi_collocations_ranks_planted_phrase_first(spark):
    """A phrase whose halves ONLY occur together ("bona fide") must
    out-PMI pairs of independently frequent words, even when the latter
    co-occur more often in absolute count; pairs under PMI_MIN_COUNT
    never appear."""
    from extract_ocr_spark.operators.textanalysis import (
        PMI_MIN_COUNT,
        pmi_collocations_df,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    rows = []
    for i in range(10):
        # "bona fide" appears 10x, its words never apart; the filler
        # words are frequent but their ADJACENCIES vary per doc (stride
        # permutation, stride coprime to 8), so no filler pair is
        # predictive
        stride = (1, 3, 5, 7)[i % 4]
        # the +i offset varies the START word too, else "fide <start>"
        # would itself be perfectly predictive
        filler = " ".join(words[(j * stride + i) % 8] for j in range(8))
        rows.append((i, f"{filler} bona fide {filler}", "en", "s", 80))
    rows.append((10, "rare pair " * (PMI_MIN_COUNT - 1), "en", "s", 40))
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")

    out = pmi_collocations_df(docs).collect()
    assert out, "no collocations found"
    assert (out[0]["w1"], out[0]["w2"]) == ("bona", "fide"), out[:3]
    # "rare pair" occurs only PMI_MIN_COUNT-1 times -> filtered
    assert not any(r["w1"] == "rare" for r in out), out
    # pmi must strictly dominate every other surviving pair
    other_best = max((r["pmi"] for r in out[1:]), default=None)
    assert other_best is None or out[0]["pmi"] > other_best


def test_pmi_collocations_plan_no_python_no_cartesian_pairs(spark):
    """JVM-native end-to-end; the only nested-loop is the broadcast of
    the single-row total — never a vocabulary cross product; top-K is
    TakeOrdered, not a global sort."""
    from extract_ocr_spark.operators.textanalysis import pmi_collocations_df

    rows = [(i, f"word{i % 7} word{(i + 1) % 7} and some more text here",
             "en", "s", 40) for i in range(30)]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    plan = pmi_collocations_df(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
               "MapInPandas"):
        assert py not in plan, plan


def test_vocab_coverage_monotone_and_complete(spark):
    """Ranks order by frequency (ties alphabetic), coverage is strictly
    increasing, and when the whole vocabulary fits in the top-K window
    the last prefix covers exactly 1.0 of all occurrences."""
    from extract_ocr_spark.operators.textanalysis import vocab_coverage_df

    rows = [(i, "zeta zeta zeta beta beta alpha", "en", "s", 30)
            for i in range(4)]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    out = vocab_coverage_df(docs).collect()
    assert [r["word"] for r in out] == ["zeta", "beta", "alpha"]
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert [r["tf"] for r in out] == [12, 8, 4]
    covs = [r["coverage"] for r in out]
    assert covs == sorted(covs) and covs[-1] == 1.0
    assert covs[0] == 0.5  # 12 of 24


def test_vocab_coverage_plan_takeordered_no_python(spark):
    """The full vocabulary is never globally sorted: top-K comes from
    TakeOrderedAndProject (per-partition heaps); the rank window then
    touches only K rows. JVM-native throughout."""
    from extract_ocr_spark.operators.textanalysis import vocab_coverage_df

    rows = [(i, f"word{i % 9} filler text number {i}", "en", "s", 30)
            for i in range(40)]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    plan = vocab_coverage_df(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
               "MapInPandas"):
        assert py not in plan, plan


def test_hll_linear_counting_branch_matches_oracle(spark, tmp_path):
    """The linear-counting branch (registers not saturated, raw estimate
    under 2.5m) is DEAD at both driver scales — every testdata source
    fills all 64 registers — so its cross-engine parity (JVM Math.log vs
    DuckDB std::log inside round(4)) is pinned here on a corpus of small
    sources, alongside one saturated source taking the raw branch."""
    import duckdb

    from extract_ocr_spark.operators.textanalysis import (
        HLL_DISTINCT_SQL,
        HLL_M,
        hll_distinct,
    )

    rows = []
    # small sources: 4..14 distinct bigrams each -> hit << 64 -> LC branch
    for s in range(8):
        text = " ".join(f"s{s}w{i}" for i in range(5 + s))
        rows.append((s, text, "en", f"small{s}", len(text)))
    # one saturated source (the raw-estimator branch stays covered here)
    big = " ".join(f"b{i} c{i}" for i in range(300))
    rows.append((100, big, "en", "big", len(big)))
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d))

    got = {r["source"]: tuple(r) for r in hll_distinct(spark, str(tmp_path)).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    want = {r[0]: tuple(r) for r in con.sql(HLL_DISTINCT_SQL).fetchall()}
    assert got == want
    # the fixture must actually exercise both branches
    assert any(r[2] < HLL_M for r in got.values()), got
    assert got["big"][2] == HLL_M, got


# -- BPE merge learning: external python reference (the k_core lesson) --------

def _bpe_reference(texts, n_merges):
    import collections
    import re

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    freq = collections.Counter()
    for t in texts:
        for w in ws.split(t.lower()):
            if w:
                freq[w] += 1
    words = {w: list(w) for w in freq}

    def best(words):
        cnt = collections.Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += freq[w]
        return min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))

    def merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    merges = []
    for r in range(1, n_merges + 1):
        (a, b), c = best(words)
        merges.append((r, a, b, c))
        words = {w: merge(s, a, b) for w, s in words.items()}
    return merges


def _bpe_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long")


def test_bpe_merges_matches_python_reference(spark):
    from extract_ocr_spark.operators.textanalysis import (
        BPE_N_MERGES,
        bpe_merges_df,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the rain in spain stays mainly in the plain",
        "she sells sea shells by the sea shore",
    ]
    got = [tuple(r) for r in bpe_merges_df(_bpe_docs(spark, texts)).collect()]
    assert got == _bpe_reference(texts, BPE_N_MERGES), got


def test_bpe_merges_greedy_overlap_run(spark):
    """A run of overlapping matches ('aaaa' under pair (a,a)) must merge
    greedily left-to-right: [aa, aa], never [a, aa, a] or [aa, a, a] —
    the island-parity rule the oracle uses and the fold's replace-last
    must agree on odd AND even runs (aaaaa -> [aa, aa, a] leaves a
    trailing singleton, so the NEXT round's (aa, aa) count tells the
    two apart)."""
    from extract_ocr_spark.operators.textanalysis import bpe_merges_df

    # 'aaaa' x3, 'aaaaa' x2: merge 1 must be (a,a) cnt=3*3+2*4=17
    # (pair count BEFORE merging: positions, not greedy pairs);
    # after greedy merge: aaaa->[aa,aa], aaaaa->[aa,aa,a]
    # merge 2: (aa,aa) cnt=3+2=5
    texts = ["aaaa aaaa aaaa", "aaaaa aaaaa"]
    got = [tuple(r) for r in bpe_merges_df(_bpe_docs(spark, texts)).collect()]
    ref = _bpe_reference(texts, 3)
    assert got == ref, (got, ref)
    assert got[0][:3] == (1, "a", "a"), got
    assert got[1][:3] == (2, "aa", "aa"), got


def test_js_divergence_identical_and_disjoint_sources(spark, tmp_path):
    """JS boundaries: two sources with IDENTICAL token mixes diverge by
    0; two sources with fully DISJOINT vocabularies diverge by ln 2
    (the JS maximum), up to hash-bucket collisions (none here by
    construction check)."""
    import math

    from extract_ocr_spark.operators.textanalysis import js_divergence

    docs = []
    # a and b: identical unigram distributions
    for i in range(20):
        docs.append((i, "alpha beta gamma", "en", "src_a", 10))
        docs.append((100 + i, "alpha beta gamma", "en", "src_b", 10))
    # c: disjoint vocabulary
    for i in range(20):
        docs.append((200 + i, "delta epsilon zeta", "en", "src_c", 10))
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long").coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet"))

    got = {(r["s1"], r["s2"]): r["js_nats"]
           for r in js_divergence(spark, str(tmp_path)).collect()}
    assert got[("src_a", "src_b")] == 0.0
    assert abs(got[("src_a", "src_c")] - math.log(2)) < 1e-6
    assert abs(got[("src_b", "src_c")] - math.log(2)) < 1e-6


def test_js_divergence_refuses_unbounded_source_sets(spark, tmp_path):
    """Pairwise-over-sources is O(S^2): more than JS_MAX_SOURCES
    sources must refuse with guidance, not degrade."""
    import pytest as _pytest

    from extract_ocr_spark.operators.textanalysis import (
        JS_MAX_SOURCES,
        js_divergence,
    )

    n = JS_MAX_SOURCES + 1
    spark.createDataFrame(
        [(i, f"tok{i}", "en", f"s{i:03d}", 4) for i in range(n)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long").coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet"))
    with _pytest.raises(ValueError, match="JS_MAX_SOURCES"):
        js_divergence(spark, str(tmp_path))


def test_tokenizer_fertility_known_values(spark, tmp_path):
    """Hand-computed fertility: pure words give 1.0; punctuation-glued
    text emits extra BPE-ish tokens per whitespace word."""
    from extract_ocr_spark.operators.textanalysis import tokenizer_fertility

    spark.createDataFrame(
        [
            (1, "alpha beta gamma", "aa", "s", 16),   # ws=3, bpe=3
            (2, "a,b c;d", "bb", "s", 7),             # ws=2, bpe=6
            (3, "x y", "bb", "s", 3),                 # ws=2, bpe=2
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long").coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet"))

    got = {r["lang"]: (r["n_docs"], r["ws_tokens"], r["bpe_tokens"],
                       r["fertility"])
           for r in tokenizer_fertility(spark, str(tmp_path)).collect()}
    assert got["aa"] == (1, 3, 3, 1.0)
    assert got["bb"] == (2, 4, 8, 2.0)


def test_binned_auc_known_values(spark):
    """Perfect separation -> 1.0, inverted -> 0.0, everything tied ->
    0.5 (midrank credit), and a no-negatives group -> NULL."""
    from extract_ocr_spark.operators.textanalysis import binned_auc_df

    rows = (
        # perfect: all positives above all negatives
        [("perf", 10, 0), ("perf", 11, 0), ("perf", 20, 1), ("perf", 21, 1)]
        # inverted: all positives below all negatives
        + [("inv", 20, 0), ("inv", 21, 0), ("inv", 10, 1), ("inv", 11, 1)]
        # all four items share one bin -> every pos/neg pair ties
        + [("tie", 5, 0), ("tie", 5, 0), ("tie", 5, 1), ("tie", 5, 1)]
        # degenerate: no negative examples
        + [("onlyp", 3, 1), ("onlyp", 4, 1)]
    )
    df = spark.createDataFrame(rows, "grp string, bin long, label long")
    got = {r["grp"]: r for r in binned_auc_df(df).collect()}
    assert got["perf"]["auc"] == 1.0
    assert got["inv"]["auc"] == 0.0
    assert got["tie"]["auc"] == 0.5
    assert got["onlyp"]["auc"] is None
    assert got["perf"]["two_u"] == 8  # 4 pairs, each worth 2


def test_binned_auc_matches_pairwise_bruteforce(spark):
    """The histogram 2U formula == the O(n^2) Mann-Whitney definition
    (2 per pos>neg pair, 1 per tie) on a seeded random group, ties
    guaranteed by a narrow bin range."""
    import random

    from extract_ocr_spark.operators.textanalysis import binned_auc_df

    rng = random.Random(42)
    items = [(rng.randrange(0, 7), rng.randrange(0, 2)) for _ in range(60)]
    pos = [b for b, l in items if l]
    neg = [b for b, l in items if not l]
    two_u = sum(2 if p > q else (1 if p == q else 0)
                for p in pos for q in neg)
    df = spark.createDataFrame([("g", b, l) for b, l in items],
                               "grp string, bin long, label long")
    row = binned_auc_df(df).collect()[0]
    assert row["two_u"] == two_u
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["auc"] == round(two_u / (2.0 * len(pos) * len(neg)), 6)


def test_pr_curve_confusion_counts_and_monotone_recall(spark, tmp_path):
    """Drive pr_curve end-to-end over a crafted corpus and check the
    confusion counts at the extreme thresholds (thr=0 predicts
    everything positive -> recall 1.0 and fn 0; thr=2*OFFSET keeps only
    score >= 1.0), plus recall monotone non-increasing in the
    threshold for every source."""
    from extract_ocr_spark.operators.textanalysis import AUC_OFFSET, pr_curve

    rows = [(i, f"word{i} and some tokens {i}", "en" if i % 3 == 0 else "fr",
             f"s{i % 2}", 20) for i in range(24)]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = pr_curve(spark, str(tmp_path)).collect()

    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == {"s0", "s1"}
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["thr_bin"])
        assert len(rs) == 21
        n_pos = sum(1 for i in range(24)
                    if i % 3 == 0 and f"s{i % 2}" == src)
        lo = rs[0]
        assert lo["thr_bin"] == 0
        assert lo["tp"] == n_pos and lo["fn"] == 0 and lo["rec"] == 1.0
        # every doc predicted positive at thr 0
        assert lo["tp"] + lo["fp"] == 12
        hi = rs[-1]
        assert hi["thr_bin"] == 2 * AUC_OFFSET
        # recall non-increasing as the threshold rises
        recs = [r["rec"] for r in rs]
        assert all(a >= b for a, b in zip(recs, recs[1:]))
        # tp + fn is the positive count at every threshold
        assert all(r["tp"] + r["fn"] == n_pos for r in rs)


def test_calibration_bins_invariants(spark):
    """Per-(source, cal_bin) rows must be internally consistent (n_pos
    <= n, obs_rate = n_pos/n, mean_score inside the bin's score range)
    and roll up to the corpus totals; bins are the 0.1-wide coarsening
    of the shared operating-point space."""
    from pyspark.sql import functions as F

    from extract_ocr_spark.operators.textanalysis import calibration_bins

    sf = "/root/testdata/sf0.001"
    rows = calibration_bins(spark, sf).collect()
    assert rows
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_docs = docs.filter(F.trim("text") != "").count()
    assert sum(r["n"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n"]
        assert r["obs_rate"] == round(r["n_pos"] / r["n"], 6)
        lo = r["cal_bin"] * 1000 / 10_000 - 1.0
        assert lo - 1e-9 <= r["mean_score"] <= lo + 0.1 + 1e-9, r


def test_ks_drift_perfect_separation_and_identical(spark, tmp_path):
    """Two crafted sources whose score supports are disjoint must reach
    KS = 1.0 against each other — the analytic value checked both ways
    (symmetry) plus the d_num = n_src*n_rest identity."""
    from extract_ocr_spark.operators.textanalysis import ks_drift

    # s0 docs repeat one token => every token hits the same bucket (one
    # distinct score bin); s1 uses a different token => a different bin.
    rows = (
        [(i, "alpha alpha alpha", "en", "s0", 17) for i in range(6)]
        + [(i + 100, "omega omega", "en", "s1", 11) for i in range(4)]
    )
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r["source"]: r for r in ks_drift(spark, str(tmp_path)).collect()}
    assert set(got) == {"s0", "s1"}
    for src, n_src, n_rest in (("s0", 6, 4), ("s1", 4, 6)):
        r = got[src]
        assert (r["n_src"], r["n_rest"]) == (n_src, n_rest)
        # disjoint single-bin supports: sup|F_src - F_rest| = 1.0 and
        # the integer numerator is exactly n_src * n_rest
        assert r["d_num"] == n_src * n_rest
        assert r["ks"] == 1.0


def test_ks_drift_zero_drift_and_tie_break(spark, tmp_path):
    """A source whose score mixture mirrors its complement exactly must
    report KS = 0 — and with d_num = 0 at EVERY bin, dmax ties across
    the whole grid, so ks_bin must be the SMALLEST bin (the documented
    deterministic tie-break). s2 = 3 alpha-docs + 2 omega-docs against a
    rest of 6 alpha + 4 omega: identical 3:2 mixture."""
    from extract_ocr_spark.operators.textanalysis import _qc_scored, ks_drift

    rows = (
        [(i, "alpha alpha alpha", "en", "s0", 17) for i in range(6)]
        + [(i + 100, "omega omega", "en", "s1", 11) for i in range(4)]
        + [(i + 200, "alpha alpha alpha", "en", "s2", 17) for i in range(3)]
        + [(i + 300, "omega omega", "en", "s2", 11) for i in range(2)]
    )
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    bins = sorted({r["bin"]
                   for r in _qc_scored(spark, str(tmp_path)).collect()})
    assert len(bins) == 2  # alpha bin + omega bin
    got = {r["source"]: r for r in ks_drift(spark, str(tmp_path)).collect()}
    r = got["s2"]
    assert (r["n_src"], r["n_rest"]) == (5, 10)
    assert r["d_num"] == 0
    assert r["ks"] == 0.0
    # all-tied dmax=0: the smallest grid bin must win
    assert r["ks_bin"] == bins[0]
    # the drifted sources still register against the 3-source rest
    assert got["s0"]["d_num"] > 0 and got["s1"]["d_num"] > 0


def test_ks_drift_matches_python_replay(spark):
    """External truth at sf0.001: recompute each source's KS statistic
    in pure python from the per-doc integer bins (via the shared
    _qc_scored projection) and require exact agreement on n_src, n_rest,
    d_num, ks_bin, and the rounded ks."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from extract_ocr_spark.operators.textanalysis import _qc_scored, ks_drift

    scored = [(r["grp"], r["bin"])
              for r in _qc_scored(spark, SF).collect()]
    out = {r["source"]: r for r in ks_drift(spark, SF).collect()}

    bins = sorted({b for _, b in scored})
    by_src = {}
    for g, b in scored:
        by_src.setdefault(g, Counter())[b] += 1
    total = Counter()
    for c in by_src.values():
        total.update(c)
    n_all = sum(total.values())
    assert set(out) == set(by_src)
    for src, cnt in by_src.items():
        n_src = sum(cnt.values())
        n_rest = n_all - n_src
        cum_s = cum_t = 0
        best = (-1, None)
        for b in bins:
            cum_s += cnt.get(b, 0)
            cum_t += total[b]
            d = abs(cum_s * n_rest - (cum_t - cum_s) * n_src)
            if d > best[0]:
                best = (d, b)
        r = out[src]
        assert (r["n_src"], r["n_rest"]) == (n_src, n_rest)
        assert r["d_num"] == best[0]
        assert r["ks_bin"] == best[1]
        # Spark's round() is HALF_UP on the double; python's round() is
        # half-even — quantize explicitly (the pagerank mirror lesson)
        want = float(Decimal(best[0] / (n_src * n_rest))
                     .quantize(Decimal("0.000001"), ROUND_HALF_UP))
        assert r["ks"] == want


def test_chi2_drift_known_values(spark, tmp_path):
    """Analytic 2x2 table: sources a/b with en/fr doc counts 30/10 vs
    10/30 → every expected count is 20, every cell term (±10)²/20 = 5,
    so each source's chi2 part is exactly 10.0. A zero cell must still
    contribute its full expected-count term (checked on a second,
    asymmetric corpus)."""
    from extract_ocr_spark.operators.textanalysis import chi2_drift

    rows = []
    did = 0
    for src, lang, k in (("a", "en", 30), ("a", "fr", 10),
                         ("b", "en", 10), ("b", "fr", 30)):
        for _ in range(k):
            rows.append((did, "w", lang, src, 1))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r["source"]: r for r in chi2_drift(spark, str(tmp_path)).collect()}
    for src in ("a", "b"):
        r = got[src]
        assert (r["n_src"], r["n_cells"]) == (40, 2)
        assert r["chi2_part"] == 10.0

    # zero cell: a = 4 en only; b = 2 en + 2 fr → e(a,fr) = 1, term 1.0
    rows2 = ([(i, "w", "en", "a", 1) for i in range(4)]
             + [(10, "w", "en", "b", 1), (11, "w", "en", "b", 1),
                (12, "w", "fr", "b", 1), (13, "w", "fr", "b", 1)])
    spark.createDataFrame(
        rows2, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got2 = {r["source"]: r for r in chi2_drift(spark, str(tmp_path)).collect()}
    a = got2["a"]
    # e(a,en)=3, o=4 → 1/3; e(a,fr)=1, o=0 → 1.0
    assert a["n_cells"] == 2
    assert a["chi2_part"] == round(1.0 / 3.0 + 1.0, 6)


def test_chi2_drift_independent_mix_is_zero(spark, tmp_path):
    """Sources whose language mixes are exactly proportional to the
    corpus margins sit at independence: every part must be 0.0."""
    from extract_ocr_spark.operators.textanalysis import chi2_drift

    rows = []
    did = 0
    for src, scale in (("a", 1), ("b", 3)):
        for lang, k in (("en", 2), ("fr", 6)):
            for _ in range(k * scale):
                rows.append((did, "w", lang, src, 1))
                did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    for r in chi2_drift(spark, str(tmp_path)).collect():
        assert r["chi2_part"] == 0.0


def test_self_bleu_clip_and_diversity_semantics(spark, tmp_path):
    """The BLEU clip rule against corpus-minus-self: identical docs score
    1.0, a doc with no shared bigrams scores 0.0, and a repeated bigram
    clips at the MAX count of that bigram in any OTHER doc (3 copies vs
    1 elsewhere -> 1 of 3 credited)."""
    from extract_ocr_spark.operators.textanalysis import self_bleu

    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        [
            # 1 and 2: identical -> every bigram clips at full count
            (1, "the cat sat on the mat", "en", "s", 22),
            (2, "the cat sat on the mat", "en", "s", 22),
            # 3: disjoint bigram vocabulary -> 0.0
            (3, "zq wx yv ut", "en", "s", 11),
            # 4: "aa bb" x3 (interleaved so count=3), doc 5 has it once
            (4, "aa bb aa bb aa bb", "en", "s", 17),
            (5, "aa bb cc dd", "en", "s", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d))
    got = {r["doc_id"]: r for r in self_bleu(spark, str(tmp_path)).collect()}
    assert got[1]["self_bleu2"] == 1.0 and got[2]["self_bleu2"] == 1.0
    assert got[3]["self_bleu2"] == 0.0
    # doc 4 bigrams: "aa bb" x3, "bb aa" x2 -> clipped: min(3, 1 [doc5])
    # + min(2, 0) = 1 of 5
    assert got[4]["n_bigrams"] == 5
    assert got[4]["clipped_bigrams"] == 1
    # doc 5: "aa bb" appears in 4 (clip 1), "bb cc"/"cc dd" nowhere else
    assert got[5]["clipped_bigrams"] == 1 and got[5]["n_bigrams"] == 3


def test_self_bleu_plan_topk_window_no_cartesian(spark):
    """Scale pins on the LAZY production frame (_checkpoint=False — the
    localCheckpoint would otherwise bound the plan at Scan ExistingRDD
    and make every assert vacuous): the per-bigram max-over-others is a
    map-side top-2 (WindowGroupLimit), the clip join stays an equi join
    (no cartesian / nested loop), and nothing drops to Python."""
    from extract_ocr_spark.operators.textanalysis import self_bleu_df

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lazy = self_bleu_df(docs, _checkpoint=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Python" not in plan, plan


def test_nb_lang_confusion_learns_separable_vocab(spark, tmp_path):
    """On a lexically separable corpus the trained NB recovers the
    classes; a token-less doc falls back to the prior argmax (most
    docs, tie -> lowest lang) — here a tie resolved to 'xx', so the
    empty 'yy' doc lands in the (yy, xx) cell."""
    from extract_ocr_spark.operators.textanalysis import nb_lang_confusion

    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        [
            (1, "aaa bbb aaa bbb", "xx", "s", 15),
            (2, "aaa aaa bbb", "xx", "s", 11),
            (3, "bbb aaa", "xx", "s", 7),
            (4, "ccc ddd ccc", "yy", "s", 11),
            (5, "ddd ccc ddd", "yy", "s", 11),
            (6, "   ", "yy", "s", 3),  # token-less -> prior argmax
        ],
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d))
    got = {(r["lang"], r["pred_lang"]): r["n_docs"]
           for r in nb_lang_confusion(spark, str(tmp_path)).collect()}
    assert got == {("xx", "xx"): 3, ("yy", "yy"): 2, ("yy", "xx"): 1}


def test_nb_lang_confusion_plan_no_cartesian_no_python(spark):
    """Scale pins: the learned model is a bounded broadcast (langs x
    NB_BUCKETS) — the only nested-loop join allowed is the ≤|langs|-row
    candidate-class broadcast; no CartesianProduct, nothing in Python,
    and the argmax is a map-side top-1 (WindowGroupLimit)."""
    from extract_ocr_spark.operators.textanalysis import nb_lang_confusion_df

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lazy = nb_lang_confusion_df(docs, _checkpoint=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert lazy.count() > 0
