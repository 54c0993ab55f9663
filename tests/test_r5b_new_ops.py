"""External-truth and contract tests for the round-5 late additions:
BPE encode (python reference), interleave packing (independent next-fit
reference), weighted shortest paths (python Dijkstra reference — the
k_core fixpoint lesson), SCD2 intervals, and the TPC-H completion block
(tie semantics + plan pins)."""

from __future__ import annotations

import heapq

import pytest

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _write(spark, tmp_path, name, df):
    df.write.mode("overwrite").parquet(f"{tmp_path}/{name}.parquet")


# -- bpe_encode ---------------------------------------------------------------

def _py_bpe(texts, n_merges):
    """Independent pure-python BPE: learn merges (max pair count, ties →
    lexicographic), apply each greedily left-to-right; then encode."""
    import re
    words = []
    for t in texts:
        words += [w for w in re.split(r"\s+", t.lower()) if w]
    freq = {}
    for w in words:
        freq[w] = freq.get(w, 0) + 1
    vocab = {w: [c for c in w] for w in freq}

    def merge(seq, a, b):
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        return out

    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, f in freq.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + f
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        vocab = {w: merge(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def test_bpe_encode_matches_python_reference(spark, tmp_path):
    from extract_ocr_spark.operators.textanalysis import (
        BPE_HEAD_TOKENS, BPE_N_MERGES, bpe_encode_df)

    texts = ["the theme thesis the other", "other mother the the bother",
             "aaa aaaa aa theme", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in bpe_encode_df(docs).collect()}

    _, vocab = _py_bpe(texts, BPE_N_MERGES)
    import re
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"\s+", t.lower()) if w]
        n_syms = sum(len(vocab[w]) for w in toks)
        head = " | ".join(
            " ".join(vocab[w]) for w in toks[:BPE_HEAD_TOKENS])
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["n_syms"] == n_syms
        assert got[i]["n_chars"] == sum(len(w) for w in toks)
        assert got[i]["head_encoded"] == head


def test_bpe_encode_plan_two_scans_no_python(spark):
    """The encode frame scans the corpus exactly twice (token explode +
    doc_id spine); the per-rule merge passes run on the checkpointed
    VOCAB only and never re-touch the corpus. Zero Python evals."""
    from extract_ocr_spark.operators.textanalysis import bpe_encode

    plan = _plan(bpe_encode(spark, "/root/testdata/sf0.001"))
    assert plan.count("FileScan parquet") == 2, plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
               "FlatMapGroupsInPandas"):
        assert py not in plan, plan


# -- interleave_pack ----------------------------------------------------------

def test_interleave_pack_matches_python_next_fit(spark):
    """Independent python next-fit over the same deterministic span
    construction, checked window-by-window at sf0.001."""
    from extract_ocr_spark.operators.interleave import (
        K_BASE, K_SPREAD, MEDIA_LT, MEDIA_MOD, PACK_CTX, PACK_MEDIA_BASE,
        PACK_MEDIA_STEP, TEXT_LEN, TEXT_STRIDE, interleave_pack_query)

    sf = "/root/testdata/sf0.001"
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf}/documents.parquet")
            .select("doc_id", "text").collect()}

    expect = []
    for d in sorted(docs):
        text = docs[d]
        win, used, ns, nm = 1, 0, 0, 0
        rows = []
        for i in range(K_BASE + d % K_SPREAD):
            if (d + i) % MEDIA_MOD < MEDIA_LT:
                cost, m = PACK_MEDIA_BASE + (d % 3) * PACK_MEDIA_STEP, 1
            else:
                span = text[TEXT_STRIDE * i: TEXT_STRIDE * i + TEXT_LEN]
                cost, m = max(1, (len(span) + 3) // 4), 0
            if used > 0 and used + cost > PACK_CTX:
                rows.append((d, win, ns, nm, used))
                win, used, ns, nm = win + 1, cost, 1, m
            else:
                used, ns, nm = used + cost, ns + 1, nm + m
        if used > 0:
            rows.append((d, win, ns, nm, used))
        expect += rows

    got = [(r["doc_id"], r["win_id"], r["n_spans"], r["n_media"],
            r["tokens"]) for r in interleave_pack_query(spark, sf).collect()]
    assert got == expect


def test_interleave_pack_plan_one_shuffle_no_python(spark):
    """One doc_id exchange (the collect_list groupBy); the state machine
    is a JVM fold emitting window summaries — no second aggregation
    shuffle, no Python."""
    from extract_ocr_spark.operators.interleave import interleave_pack_query

    plan = _plan(interleave_pack_query(spark, "/root/testdata/sf0.001"))
    body = plan.split("AdaptiveSparkPlan")[-1]
    # one hash exchange for the groupBy + one range exchange for the
    # final orderBy (presentation); no third exchange
    assert body.count("Exchange hashpartitioning") == 1, plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
               "FlatMapGroupsInPandas"):
        assert py not in plan, plan


# -- dictionary_encode --------------------------------------------------------

def test_dictionary_encode_no_global_vocab_funnel(spark):
    """The vocab ranking must NOT be a global row_number: the plan's
    main rank window partitions by pid on top of a rangepartitioning
    exchange; the only SinglePartition window input is the
    DICT_RANGE_PARTS-row offset cumsum. Ids come out dense 1..V in
    (freq DESC, word) order."""
    from extract_ocr_spark.operators.textanalysis import dictionary_encode_df

    rows = [(i, "alpha beta beta gamma gamma gamma") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    df = dictionary_encode_df(docs)
    plan = _plan(df)
    assert "rangepartitioning(freq" in plan, plan
    assert "hashpartitioning(pid" in plan, plan
    out = [(r["vocab_id"], r["word"], r["freq"]) for r in df.collect()]
    assert out == [(1, "gamma", 90), (2, "beta", 60), (3, "alpha", 30)]


# -- shortest_paths -----------------------------------------------------------

def test_shortest_paths_matches_python_dijkstra(spark, tmp_path):
    """Run-to-fixpoint Bellman-Ford vs an INDEPENDENT python Dijkstra on
    a small node frame (the k_core lesson: iterative ops need external
    truth, not just the bounded-iteration oracle twin)."""
    from extract_ocr_spark.operators.links import (
        BLOCK, BRIDGE_ADD, BRIDGE_MUL, SSSP_SEEDS, shortest_paths_query)

    n = 60
    docs = spark.range(n).select(F.col("id").alias("doc_id"),
                                 F.lit("t").alias("text"))
    _write(spark, tmp_path, "documents", docs)

    adj = {}
    def add(a, b):
        w = 1 + (a + b) % 5
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    for i in range(n):
        for d in (1, 2):
            if i + d < n and (i + d) // BLOCK == i // BLOCK:
                add(i, i + d)
        if i % BLOCK == 0:
            dst = (i * BRIDGE_MUL + BRIDGE_ADD) % n
            if dst != i:
                add(i, dst)
    dist, pq = {}, [(0, s) for s in SSSP_SEEDS]
    heapq.heapify(pq)
    while pq:
        d, v = heapq.heappop(pq)
        if v in dist:
            continue
        dist[v] = d
        for u, w in adj.get(v, []):
            if u not in dist:
                heapq.heappush(pq, (d + w, u))

    got = {r["v"]: r["dist"]
           for r in shortest_paths_query(spark, str(tmp_path)).collect()}
    assert got == dist


def test_shortest_paths_raises_on_nonconvergence(spark, tmp_path, monkeypatch):
    """The convergence witness is load-bearing: with a 1-round budget the
    operator must refuse, not return a truncated distance map."""
    import extract_ocr_spark.operators.links as L

    docs = spark.range(40).select(F.col("id").alias("doc_id"),
                                  F.lit("t").alias("text"))
    _write(spark, tmp_path, "documents", docs)
    monkeypatch.setattr(L, "SSSP_MAX_ITERS", 1)
    with pytest.raises(RuntimeError, match="did not converge"):
        L.shortest_paths_query(spark, str(tmp_path))


# -- mmr_rerank ---------------------------------------------------------------

def test_mmr_prefers_diverse_over_redundant(spark, tmp_path):
    """The defining MMR behavior on a hand-checkable fixture: after the
    first pick B, the second pick is the DIVERSE mirror candidate C
    (equal relevance, sim≈0.62 to B), not A (sim≈1.0 to B) — plain
    cosine ranking would have returned B, A, C. (Geometry note: with
    λ=0.7 diversity can only win when the redundant pair sits away from
    the query — if the top pick IS the query direction, rel and sim
    cancel and relevance always dominates.)"""
    from extract_ocr_spark.operators.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0], 0),        # query
        (1, [0.9, 0.436], 0),      # A: ~dup of B, slightly longer norm
        (2, [0.9, 0.435], 0),      # B: top rel (tie with C, vec_id wins)
        (3, [0.9, -0.435], 1),     # C: mirror of B — diverse, equal rel
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    _write(spark, tmp_path, "embeddings", emb)

    out = [(r["rank"], r["vec_id"]) for r in
           mmr_rerank(spark, str(tmp_path)).collect()]
    assert out == [(1, 2), (2, 3), (3, 1)]  # B, then C (diverse), then A


# -- scd2_intervals -----------------------------------------------------------

def test_scd2_collapses_repeats_and_flags_current(spark, tmp_path):
    from extract_ocr_spark.operators.temporal import scd2_intervals_query

    rows = [
        # user 1: a a b a  -> versions a, b, a (repeat collapses)
        (0, "2024-01-01 00:00:00", 1, "a", 0.0, "{}"),
        (1, "2024-01-01 01:00:00", 1, "a", 0.0, "{}"),
        (2, "2024-01-01 02:00:00", 1, "b", 0.0, "{}"),
        (3, "2024-01-01 03:00:00", 1, "a", 0.0, "{}"),
        # user 2: equal timestamps — event_id breaks the tie
        (5, "2024-01-01 00:00:00", 2, "x", 0.0, "{}"),
        (4, "2024-01-01 00:00:00", 2, "y", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double, props string") \
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    _write(spark, tmp_path, "events", ev)

    out = [(r["user_id"], r["version"], r["event_type"], r["is_current"])
           for r in scd2_intervals_query(spark, str(tmp_path)).collect()]
    assert out == [
        (1, 1, "a", False), (1, 2, "b", False), (1, 3, "a", True),
        (2, 1, "y", False), (2, 2, "x", True),
    ]


# -- TPC-H completion block ---------------------------------------------------

def test_top_supplier_returns_all_ties(spark, tmp_path):
    """Q15's defining semantics: EVERY supplier tied at the max revenue
    comes back, not an arbitrary single row."""
    from extract_ocr_spark.operators.relational import top_supplier_query

    li = spark.createDataFrame(
        [(1, 100.0, 0.0, "1996-02-01"), (2, 100.0, 0.0, "1996-02-02"),
         (3, 40.0, 0.0, "1996-02-03"), (3, 60.0, 0.0, "1996-02-04"),
         (9, 999.0, 0.0, "1997-06-01")],  # outside the quarter
        "l_suppkey long, l_extendedprice double, l_discount double,"
        " l_shipdate string") \
        .withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    sup = spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3"), (9, "S9")],
        "s_suppkey long, s_name string")
    _write(spark, tmp_path, "lineitem", li)
    _write(spark, tmp_path, "supplier", sup)

    out = [(r["s_suppkey"], r["total_rev_cbp"])
           for r in top_supplier_query(spark, str(tmp_path)).collect()]
    assert out == [(1, 100 * 100 * 10000), (2, 100 * 100 * 10000),
                   (3, 100 * 100 * 10000)]


def test_revenue_delta_plan_pushes_all_filters(spark):
    """Q6's point: the date/quantity predicates reach the lineitem scan
    as PushedFilters and the projection prunes to the 4 needed columns."""
    from extract_ocr_spark.operators.relational import revenue_delta_query

    df = revenue_delta_query(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan, plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200], plan
    scan_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    for col in ("l_extendedprice", "l_discount", "l_quantity",
                "l_shipdate"):
        assert col in scan_schema, scan_schema
    assert "l_orderkey" not in scan_schema, scan_schema


def test_important_parts_threshold_is_broadcast_not_collect(spark):
    """Q11's global scalar threshold joins back via broadcast — the plan
    contains a BroadcastNestedLoopJoin over the 1-row total, no driver
    collect in the operator."""
    from extract_ocr_spark.operators.relational import important_parts_query

    df = important_parts_query(spark, "/root/testdata/sf0.01")
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_min_cost_supplier_plan_argmin_window_broadcast_dims(spark):
    """Q2 adaptation: one (part,supp) partial aggregate, a per-part
    row_number argmin, dims broadcast — no correlated re-scan (exactly
    one lineitem FileScan)."""
    from extract_ocr_spark.operators.relational import min_cost_supplier_query

    df = min_cost_supplier_query(spark, "/root/testdata/sf0.01")
    plan = _plan(df)
    assert plan.count("FileScan parquet") == 4, plan  # li + part + sup + nat
    assert "RunningWindowFunction" in plan or "Window" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


# -- late_ship_priority (Q12) / dominant_suppliers (Q20) ----------------------

def test_late_ship_priority_counts_lines_not_orders(spark, tmp_path):
    """Q12 counts LINES (unlike Q4's per-order semi join): two late
    lines of one urgent order contribute 2 to high_count; an on-time
    line and an out-of-window line contribute nothing."""
    from extract_ocr_spark.operators.relational import (
        late_ship_priority_query)

    li = spark.createDataFrame(
        [  # (orderkey, returnflag, shipdate)
            (1, "A", "1997-06-01"),   # late line 1 of urgent order
            (1, "A", "1997-07-01"),   # late line 2 of urgent order
            (2, "A", "1997-03-02"),   # 60 days after order (cap 45) -> late, low-priority
            (3, "A", "1997-01-10"),   # shipped 9 days after order: on time
            (4, "A", "1996-06-01"),   # outside the ship window
        ],
        "l_orderkey long, l_returnflag string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    o = spark.createDataFrame(
        [(1, "1997-01-01", "1-URGENT"), (2, "1997-01-01", "5-LOW"),
         (3, "1997-01-01", "2-HIGH"), (4, "1996-01-01", "1-URGENT")],
        "o_orderkey long, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    _write(spark, tmp_path, "lineitem", li)
    _write(spark, tmp_path, "orders", o)

    rows = late_ship_priority_query(spark, str(tmp_path)).collect()
    assert [(r["l_returnflag"], r["high_count"], r["low_count"])
            for r in rows] == [("A", 2, 1)]


def test_late_ship_priority_plan_pushes_ship_window(spark):
    """The ship-window predicate reaches the lineitem scan and the scan
    reads only the 3 fact columns the query needs."""
    from extract_ocr_spark.operators.relational import (
        late_ship_priority_query)

    df = late_ship_priority_query(spark, "/root/testdata/sf0.01")
    plan = _plan(df)
    assert "PushedFilters: [" in plan, plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200], plan
    li_scan = [ln for ln in plan.split("\n")
               if "FileScan parquet" in ln and "lineitem" in ln][0]
    schema = li_scan.split("ReadSchema: ")[1]
    assert "l_orderkey" in schema and "l_returnflag" in schema, schema
    assert "l_quantity" not in schema, schema


def test_dominant_suppliers_majority_gate(spark, tmp_path):
    """The share gate is a STRICT majority: exactly half does not
    qualify; a supplier dominating a non-prefix part does not qualify;
    out-of-window volume is ignored."""
    from extract_ocr_spark.operators.relational import (
        dominant_suppliers_query)

    li = spark.createDataFrame(
        [  # (partkey, suppkey, qty, shipdate)
            (1, 10, 30.0, "1997-02-01"),  # 30/50 of part 1 -> majority
            (1, 11, 20.0, "1997-02-01"),
            (2, 12, 25.0, "1997-02-01"),  # exactly half -> NOT strict
            (2, 13, 25.0, "1997-02-01"),
            (3, 14, 99.0, "1997-02-01"),  # dominates a non-prefix part
            (1, 15, 500.0, "1996-02-01"),  # out of window
        ],
        "l_partkey long, l_suppkey long, l_quantity double, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    part = spark.createDataFrame(
        [(1, "small ring"), (2, "small bolt"), (3, "red widget")],
        "p_partkey long, p_name string")
    sup = spark.createDataFrame(
        [(s, f"S{s}") for s in (10, 11, 12, 13, 14, 15)],
        "s_suppkey long, s_name string")
    _write(spark, tmp_path, "lineitem", li)
    _write(spark, tmp_path, "part", part)
    _write(spark, tmp_path, "supplier", sup)

    rows = dominant_suppliers_query(spark, str(tmp_path)).collect()
    assert [r["s_suppkey"] for r in rows] == [10]


def test_dominant_suppliers_plan_window_not_joinback(spark):
    """The per-part total is a window over the (part, supp) aggregate,
    never a join-back that would re-execute it: exactly ONE lineitem
    FileScan; the part prune is a broadcast join; no cartesian."""
    from extract_ocr_spark.operators.relational import (
        dominant_suppliers_query)

    df = dominant_suppliers_query(spark, "/root/testdata/sf0.01")
    plan = _plan(df)
    li_scans = [ln for ln in plan.split("\n")
                if "FileScan parquet" in ln and "lineitem" in ln]
    assert len(li_scans) == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


# -- fim_plan -----------------------------------------------------------------

def test_fim_plan_reorder_reconstructs_and_passthrough(spark, tmp_path):
    """For every FIM-applied doc the PSM head must equal the head of
    prefix ⧺ <FIM_SUF> ⧺ suffix ⧺ <FIM_MID> ⧺ middle rebuilt from the
    reported lengths, and the lengths must partition the doc; for
    unselected docs the head is the doc head and prefix_len = n. Both
    branches must occur (hash parity, measured not guessed)."""
    from extract_ocr_spark.operators.curation import fim_plan

    texts = {i: f"doc {i} " + "abcdefghij" * 6 for i in range(40)}
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, "
        "n_chars long").coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet"))

    rows = fim_plan(spark, str(tmp_path)).collect()
    applied = [r for r in rows if r["fim_applied"]]
    passed = [r for r in rows if not r["fim_applied"]]
    assert applied and passed, (len(applied), len(passed))
    for r in rows:
        t = texts[r["doc_id"]]
        n = len(t)
        if r["fim_applied"]:
            pl, ml, sl = r["prefix_len"], r["middle_len"], r["suffix_len"]
            assert pl + ml + sl == n, r
            rebuilt = (t[:pl] + "<FIM_SUF>" + t[pl + ml:]
                       + "<FIM_MID>" + t[pl:pl + ml])
            assert r["head"] == rebuilt[:48], (r, rebuilt[:60])
        else:
            assert (r["prefix_len"], r["middle_len"], r["suffix_len"]) \
                == (n, 0, 0), r
            assert r["head"] == t[:48], r


def test_fim_plan_map_only_no_python(spark):
    """FIM planning is a projection: no hash exchange, no join, no
    Python — only the presentation orderBy's range partitioning."""
    from extract_ocr_spark.operators.curation import fim_plan

    df = fim_plan(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
