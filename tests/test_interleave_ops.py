"""Branch-level unit tests for the interleaved-span structure operators
(caption_pairs / interleave_stats) and the two new rollup gates
(embedding_norm_outliers / host_reputation) on handcrafted corpora where
every expected value is computed independently in Python."""

from __future__ import annotations

import hashlib

import pytest

from extract_ocr_spark.operators.interleave import (
    K_BASE,
    K_SPREAD,
    MEDIA_LT,
    MEDIA_MOD,
    REF_LEN,
    TEXT_LEN,
    TEXT_STRIDE,
    caption_pairs_query,
    interleave_stats_query,
)


def _write_docs(spark, tmp_path, rows):
    (spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
     .coalesce(1).write.parquet(str(tmp_path / "documents.parquet")))
    return str(tmp_path)


def _py_spans(doc_id: int, text: str):
    """Independent Python mirror of the deterministic interleaving."""
    k = K_BASE + doc_id % K_SPREAD
    out = []
    for i in range(k):
        if (doc_id + i) % MEDIA_MOD < MEDIA_LT:
            ref = hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:REF_LEN]
            out.append((i, "media", None, ref))
        else:
            t = text[TEXT_STRIDE * i:TEXT_STRIDE * i + TEXT_LEN]
            out.append((i, "text", t, None))
    return out


TEXT = "".join(chr(ord("a") + (j % 26)) for j in range(150))


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("interleave")
    # doc 0: k=3, all media (caption 'none'); doc 1: media at i=0,1 then
    # text ('next'); doc 3: text run then media at i=4,5 ('prev', run=2);
    # doc 10: k=3, all text (no caption rows, max_media_run=0)
    rows = [(d, TEXT, "en", "s", len(TEXT)) for d in (0, 1, 3, 10)]
    return _write_docs(spark, tmp, rows)


def test_caption_pairs_branches(spark, sf_dir):
    got = {(r["doc_id"], r["offset"]): (r["media_ref"], r["caption"],
                                        r["caption_src"])
           for r in caption_pairs_query(spark, sf_dir).collect()}

    expect = {}
    for d in (0, 1, 3, 10):
        spans = _py_spans(d, TEXT)
        for i, kind, t, ref in spans:
            if kind != "media":
                continue
            prev = next((tt for j, kk, tt, _ in reversed(spans[:i])
                         if kk == "text"), None)
            nxt = next((tt for j, kk, tt, _ in spans[i + 1:]
                        if kk == "text"), None)
            src = "prev" if prev is not None else (
                "next" if nxt is not None else "none")
            expect[(d, i)] = (ref, prev if prev is not None else nxt, src)

    assert got == expect
    srcs = {v[2] for v in got.values()}
    assert srcs == {"prev", "next", "none"}  # every branch exercised
    assert all(d != 10 for d, _ in got)      # all-text doc emits nothing


def test_interleave_stats_exact(spark, sf_dir):
    got = {r["doc_id"]: r.asDict() for r in
           interleave_stats_query(spark, sf_dir).collect()}

    for d in (0, 1, 3, 10):
        spans = _py_spans(d, TEXT)
        kinds = [k for _, k, _, _ in spans]
        trans = sum(1 for a, b in zip(kinds, kinds[1:]) if a != b)
        chars = sum(len(t) for _, k, t, _ in spans if k == "text")
        runs, cur = [], 0
        for k in kinds:
            cur = cur + 1 if k == "media" else 0
            runs.append(cur)
        row = got[d]
        assert row["n_spans"] == len(spans)
        assert row["n_media"] == kinds.count("media")
        assert row["n_text"] == kinds.count("text")
        assert row["n_transitions"] == trans
        assert row["text_chars"] == chars
        assert row["max_media_run"] == max(runs)
    assert got[0]["max_media_run"] == 3 and got[0]["n_text"] == 0
    assert got[10]["max_media_run"] == 0 and got[10]["n_media"] == 0


def test_embedding_norm_outliers_rank_tails(spark, tmp_path):
    from extract_ocr_spark.operators.similarity import embedding_norm_outliers

    # label 0: norms 1..20 -> ceil(20/10)=2 per tail; label 1: five equal
    # norms -> ties broken by vec_id (ceil(5/10)=1 per tail)
    rows = [(i, [float(i + 1), 0.0], 0) for i in range(20)]
    rows += [(100 + i, [3.0, 4.0], 1) for i in range(5)]
    (spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
     .coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet")))

    got = {r["vec_id"]: (r["norm"], r["tag"]) for r in
           embedding_norm_outliers(spark, str(tmp_path)).collect()}
    assert got[0] == (1.0, "low") and got[1] == (2.0, "low")
    assert got[18] == (19.0, "high") and got[19] == (20.0, "high")
    assert all(got[i][1] == "mid" for i in range(2, 18))
    # equal norms: rank falls back to vec_id order
    assert got[100] == (5.0, "low")
    assert got[104] == (5.0, "high")
    assert got[101][1] == got[102][1] == got[103][1] == "mid"


def test_host_reputation_verdict_boundary(spark, tmp_path):
    from extract_ocr_spark.operators.links import (
        N_HOSTS,
        REP_ALLOW_SCORE,
        REP_SHORT_CHARS,
        host_reputation_query,
    )

    short, long_ = REP_SHORT_CHARS - 1, REP_SHORT_CHARS
    # host 0: both docs short -> score 0 (review); host 1: none short ->
    # 100 (allow); host 2: one of two short -> 50, just under the 52 bar
    rows = [
        (0, "t", "en", "s", short), (N_HOSTS, "t", "en", "s", short),
        (1, "t", "en", "s", long_), (N_HOSTS + 1, "t", "en", "s", long_),
        (2, "t", "en", "s", short), (N_HOSTS + 2, "t", "en", "s", long_),
    ]
    (spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
     .coalesce(1).write.parquet(str(tmp_path / "documents.parquet")))

    got = {r["host"]: (r["rep_score"], r["verdict"]) for r in
           host_reputation_query(spark, str(tmp_path)).collect()}
    assert got == {"h0": (0, "review"), "h1": (100, "allow"),
                   "h2": (50, "review")}
    assert REP_ALLOW_SCORE == 52  # the boundary the h2 case probes
