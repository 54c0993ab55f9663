"""Local HTML seed ingest (S5/EP2), robots kernel (P4), stateful streaming
sessionization."""

import os

import pandas as pd

from pyspark.sql import functions as F

from extract_ocr_spark.kernels.robotskit import can_fetch, parse_robots
from extract_ocr_spark.pipeline import extract_df
from extract_ocr_spark.sources import ingest_local_html, saved_from_url
from extract_ocr_spark.streaming import (
    SESSION_GAP_S,
    sessionize_batch,
    stream_sessionize,
)

SEED_HTML = """<!DOCTYPE html>
<!-- saved from url=(0042)https://ex.gov/docs/page{i}.html -->
<html><head><title>Seed {i}</title></head>
<body><main><h1>Seed {i}</h1><p>content {i}</p>
<a href="/docs/next{i}.html">next</a></main></body></html>
"""


def test_saved_from_url():
    assert saved_from_url(SEED_HTML.format(i=3)) == "https://ex.gov/docs/page3.html"
    assert saved_from_url("<html></html>") is None


def test_ingest_local_html_and_extract(spark, tmp_path):
    seeds = tmp_path / "seeds"
    seeds.mkdir()
    for i in range(4):
        (seeds / f"page{i}.html").write_text(SEED_HTML.format(i=i))
    # asset dir must be excluded
    assets = seeds / "page0_files"
    assets.mkdir()
    (assets / "junk.html").write_text("<html><body>asset junk</body></html>")

    docs = ingest_local_html(spark, str(seeds))
    rows = docs.collect()
    assert len(rows) == 4
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [f"https://ex.gov/docs/page{i}.html" for i in range(4)]

    out = extract_df(docs).collect()
    md = {r["doc_id"]: r["out_spans"][0]["text"] for r in out}
    for i in range(4):
        assert f"# Seed {i}" in md[f"https://ex.gov/docs/page{i}.html"]
        assert f"content {i}" in md[f"https://ex.gov/docs/page{i}.html"]


ROBOTS = """
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp

User-agent: bot
Disallow: /
"""


def test_robots_parse_and_match():
    rules = parse_robots(ROBOTS)
    assert ("allow", "/private/ok") in rules
    assert ("disallow", "/") not in rules  # only '*' agent applies
    assert can_fetch(rules, "/pub/x")
    assert not can_fetch(rules, "/private/secret")
    assert can_fetch(rules, "/private/ok/file")
    assert not can_fetch(rules, "/tmp/y")
    assert can_fetch([], "/anything")


def test_robots_allow_first_beats_longer_disallow():
    # Reference RobotsRules.can_fetch checks ALL Allow prefixes before any
    # Disallow: Allow:/a + Disallow:/a/b allows /a/b/c even though the
    # Disallow prefix is longer (deliberate RFC 9309 deviation).
    rules = parse_robots("User-agent: *\nAllow: /a\nDisallow: /a/b\n")
    assert can_fetch(rules, "/a/b/c")
    assert can_fetch(rules, "/a/x")
    assert not can_fetch(
        parse_robots("User-agent: *\nDisallow: /a/b\n"), "/a/b/c")


def test_sessionize_batch_pure():
    us = 1_000_000
    gap = SESSION_GAP_S * us
    ts = [0, 10 * us, gap + 20 * us, gap + 30 * us]
    # events 0,1 in one session; a gap; events 2,3 in another
    ts = [0, 10 * us, 10 * us + gap + us, 10 * us + gap + 2 * us]
    out = sessionize_batch(ts, [1.0, 2.0, 3.0, 4.0])
    assert len(out) == 2
    assert out[0] == (0, 10 * us, 2, 300.0)
    assert out[1][2] == 2 and out[1][3] == 700.0


def test_stream_sessionize(spark, tmp_path):
    in_dir = str(tmp_path / "ev")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(in_dir)

    sessions = stream_sessionize(spark, in_dir)
    q = (
        sessions.writeStream.format("memory").queryName("sess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from sess").toPandas()

    # oracle: same pure logic per user over the full batch; closed sessions
    # only (the last session per user stays open in state)
    pdf = events.orderBy("ts").toPandas()
    expected_closed = 0
    for uid, grp in pdf.groupby("user_id"):
        ts_us = [int(t.value // 1000) for t in pd.to_datetime(grp["ts"])]
        sess = sessionize_batch(ts_us, list(grp["value"]))
        expected_closed += len(sess) - 1
        grec = got[got.user_id == uid].sort_values("session_start")
        assert len(grec) == len(sess) - 1
        for (s_us, e_us, n, sv), (_, row) in zip(sess[:-1], grec.iterrows()):
            assert int(row.n_events) == n
            assert abs(row.sum_value - sv / 100.0) < 1e-9
    assert len(got) == expected_closed
    assert expected_closed > 0


def test_sitemap_kernel_discovery_and_parse():
    """S7 kernel parity (ingest_data_uspto_gov.py:587-610): sitemap lines
    are case-insensitive, split on the FIRST colon, empty values dropped,
    urls normalized; <loc> text is stripped and normalized."""
    from extract_ocr_spark.kernels.robotskit import (
        parse_sitemap_urls,
        sitemaps_from_robots,
    )

    robots = ("User-agent: *\n"
              "Sitemap: https://ex.com/a.xml\n"
              "SITEMAP:   HTTPS://EX.com/B.xml#frag\n"
              "sitemap:\n"              # empty value: dropped
              "Disallow: /x\n"
              "NotSitemap: https://ex.com/no.xml\n")
    assert sitemaps_from_robots(robots) == [
        "https://ex.com/a.xml", "https://ex.com/B.xml"]
    assert sitemaps_from_robots("") == []

    xml = ("<?xml version='1.0'?><urlset>"
           "<url><loc>  https://EX.com/p1  </loc></url>"
           "<url><LOC>https://ex.com/p2#sec</LOC></url>"
           "<url><loc>   </loc></url>"          # blank: dropped
           "</urlset>")
    assert parse_sitemap_urls(xml) == [
        "https://ex.com/p1", "https://ex.com/p2"]
    assert parse_sitemap_urls(None) == []


def test_funnel_transitions_split_fold_continuity():
    """The state-store contract: folding a sequence in two halves, the
    second continuing from the first's state, must equal one fold —
    transitions included. Exercised at every split point of a sequence
    that hits all transitions plus a restart and a window expiry."""
    from extract_ocr_spark.operators.temporal import funnel_transitions

    W = 6 * 3600 * 1_000_000
    sec = 1_000_000
    evs = [(1, 0), (2, W + sec), (1, W + 2 * sec), (0, W + 3 * sec),
           (2, W + 4 * sec), (1, W + 5 * sec), (3, 2 * W + 3 * sec),
           (3, 2 * W + 4 * sec)]
    full_tr, full_st = funnel_transitions(evs)
    assert [s for s, _ in full_tr] == [1, 2, 3]
    for cut in range(len(evs) + 1):
        t1, s1 = funnel_transitions(evs[:cut])
        t2, s2 = funnel_transitions(evs[cut:], state=s1)
        assert t1 + t2 == full_tr and s2 == full_st, cut


def test_stream_funnel_state_spans_restarts(spark, tmp_path):
    """Chronologically split the real events into two landings; the
    streaming funnel must carry per-user fold state across the restart so
    the final stage per user equals the batch event_funnel query."""
    from extract_ocr_spark.operators.temporal import event_funnel_query
    from extract_ocr_spark.streaming import stream_funnel

    in_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    cut = events.approxQuantile("event_id", [0.5], 0.0)[0]

    def run_landing(pred):
        events.filter(pred).write.mode("append").parquet(in_dir)
        before = {(r["user_id"], r["stage"])
                  for r in spark.read.parquet(out_dir).collect()} \
            if os.path.exists(out_dir) else set()
        q = (stream_funnel(spark, in_dir)
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        after = spark.read.parquet(out_dir).collect()
        return [r for r in after if (r["user_id"], r["stage"]) not in before]

    t1 = run_landing(F.col("event_id") <= cut)
    t2 = run_landing(F.col("event_id") > cut)

    # transitions only ever raise the stage, so final stage = max emitted
    final = {}
    for r in list(t1) + list(t2):
        final[r["user_id"]] = max(final.get(r["user_id"], 0), r["stage"])
    batch = {r["user_id"]: r["funnel_stage"]
             for r in event_funnel_query(spark, sf).collect()}
    assert final == {u: s for u, s in batch.items() if s > 0}
    # the restart only proves state carry if some user progressed in BOTH
    # landings
    assert {r["user_id"] for r in t1} & {r["user_id"] for r in t2}


def test_ema_steps_split_fold_continuity():
    """The state-store contract for the EMA twin: folding in two halves
    through the carried (ema, n) state equals one fold, at every cut."""
    from extract_ocr_spark.operators.temporal import ema_steps

    vals = [8.0, 4.0, 16.0, 1.0, 2.5, 100.0, 0.125]
    full = ema_steps(vals)
    for cut in range(len(vals) + 1):
        s1 = ema_steps(vals[:cut])
        assert ema_steps(vals[cut:], state=s1) == full, cut


def test_stream_ema_bitwise_matches_batch_across_restart(spark, tmp_path):
    """Chronologically split the real events into two landings; the
    streamed per-user EMA after the second landing must be BIT-IDENTICAL
    (before any rounding) to the batch ema_value_query over the same
    corpus — same recurrence, same order, carried state."""
    from decimal import ROUND_HALF_UP, Decimal

    from extract_ocr_spark.operators.temporal import ema_value_query
    from extract_ocr_spark.streaming import stream_ema

    in_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    cut_ts = events.approxQuantile("event_id", [0.5], 0.0)[0]

    def run_landing(pred):
        events.filter(pred).write.mode("append").parquet(in_dir)
        q = (stream_ema(spark, in_dir)
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    run_landing(F.col("event_id") <= cut_ts)
    run_landing(F.col("event_id") > cut_ts)

    # latest snapshot per user = the row with the highest n_events
    latest = {}
    for r in spark.read.parquet(out_dir).collect():
        if r["user_id"] not in latest or \
                r["n_events"] > latest[r["user_id"]][0]:
            latest[r["user_id"]] = (r["n_events"], r["ema_value"])

    def round6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))

    batch = {r["user_id"]: (r["n_events"], r["ema_value"])
             for r in ema_value_query(spark, sf).collect()}
    assert set(latest) == set(batch)
    for u, (n, ema) in latest.items():
        assert (n, round6(ema)) == batch[u], (u, n, ema, batch[u])
    # users must have progressed in BOTH landings for the state carry
    # to be exercised (each user fires ~2 events/day over many days)
    n_first = {u: n for u, (n, _e) in latest.items()}
    assert any(n > 1 for n in n_first.values())


def test_stream_hll_registers_match_batch_across_restart(spark, tmp_path):
    """Split the documents corpus into two landings; after the second,
    the streamed per-(source, register) state must equal the batch
    sketch's registers EXACTLY — max-rank is duplicate-insensitive and
    both paths share the hll_rank_rows expressions, so the estimate a
    downstream fold computes from the streamed registers is the batch
    estimate, bit for bit."""
    from extract_ocr_spark.operators.textanalysis import hll_rank_rows
    from extract_ocr_spark.streaming import stream_hll_registers

    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def run_landing(pred):
        docs.filter(pred).write.mode("append").parquet(in_dir)
        q = (stream_hll_registers(spark, in_dir)
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    # split at the doc_id median: source is doc_id % 20, so a parity
    # split would put every source whole into one landing and the state
    # would never span the restart
    run_landing(F.col("doc_id") < 250)
    run_landing(F.col("doc_id") >= 250)

    # the register is monotone, so the final state = max emitted m
    streamed = {}
    for r in spark.read.parquet(out_dir).collect():
        k = (r["source"], r["idx"])
        streamed[k] = max(streamed.get(k, 0), r["m"])

    batch = {(r["source"], r["idx"]): r["m"]
             for r in hll_rank_rows(docs).groupBy("source", "idx")
             .agg(F.max("rank").alias("m")).collect()}
    assert streamed == batch
    # restart must be exercised: registers re-emitted in the second
    # landing prove the state carried across the checkpoint boundary
    from collections import Counter

    emits = Counter((r["source"], r["idx"])
                    for r in spark.read.parquet(out_dir).collect())
    assert any(v >= 2 for v in emits.values()), emits


def test_stream_cms_cells_match_batch_across_restart(spark, tmp_path):
    """Split the documents corpus into two landings; after the second,
    the streamed per-(j, b) cell counts must equal the batch sketch's
    cells EXACTLY — counts are additive and both paths share the
    cms_cell_rows scheme, so any heavy-hitter estimate computed from
    the streamed cells is the batch estimate, bit for bit."""
    from extract_ocr_spark.operators import tok_array
    from extract_ocr_spark.operators.textanalysis import cms_cell_rows
    from extract_ocr_spark.streaming import stream_cms_cells

    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def run_landing(pred):
        docs.filter(pred).write.mode("append").parquet(in_dir)
        q = (stream_cms_cells(spark, in_dir)
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    run_landing(F.col("doc_id") < 250)
    run_landing(F.col("doc_id") >= 250)

    # cell counts are monotone, so the final state = max emitted cnt
    streamed = {}
    for r in spark.read.parquet(out_dir).collect():
        k = (r["j"], r["b"])
        streamed[k] = max(streamed.get(k, 0), r["cnt"])

    toks = docs.select(F.explode(tok_array(F.col("text"))).alias("tok"))
    batch = {(r["j"], r["b"]): r["cnt"]
             for r in cms_cell_rows(toks).groupBy("j", "b")
             .agg(F.count("*").alias("cnt")).collect()}
    assert streamed == batch
    # every cell must span the restart (the corpus token stream hits
    # all 64 cells in both landings at this width)
    from collections import Counter

    emits = Counter((r["j"], r["b"])
                    for r in spark.read.parquet(out_dir).collect())
    assert any(v >= 2 for v in emits.values()), emits


def test_stream_score_hist_matches_batch_across_restart(spark, tmp_path):
    """Split the documents corpus into two landings; after the second,
    the streamed per-(source, bin) pos/neg cells must equal the batch
    operating-point histogram EXACTLY — cells are additive and both
    paths share the map-only qc_scored_rows expressions, so any
    histogram-derived evaluation (AUC / PR / calibration / KS drift)
    computed from the streamed snapshot is the batch value, bit for
    bit."""
    from extract_ocr_spark.operators.textanalysis import _qc_hist, _qc_scored
    from extract_ocr_spark.streaming import stream_score_hist

    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def run_landing(pred):
        docs.filter(pred).write.mode("append").parquet(in_dir)
        q = (stream_score_hist(spark, in_dir)
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    # split at the doc_id median: source = doc_id % 20, so every source
    # spans both landings and its cells must survive the restart
    run_landing(F.col("doc_id") < 250)
    run_landing(F.col("doc_id") >= 250)

    # cell counts are monotone, so the final state = max emitted counts
    streamed = {}
    for r in spark.read.parquet(out_dir).collect():
        k = (r["grp"], r["bin"])
        prev = streamed.get(k, (0, 0))
        streamed[k] = (max(prev[0], r["pos"]), max(prev[1], r["neg"]))

    batch = {(r["grp"], r["bin"]): (r["pos"], r["neg"])
             for r in _qc_hist(_qc_scored(spark, sf)).collect()}
    assert streamed == batch and len(batch) > 0
    # restart must be exercised: a cell re-emitted in the second landing
    # proves the state carried across the checkpoint boundary
    from collections import Counter

    emits = Counter((r["grp"], r["bin"])
                    for r in spark.read.parquet(out_dir).collect())
    assert any(v >= 2 for v in emits.values()), emits
