"""Semantics tests for the temporal operators: the as-of join against
DuckDB's NATIVE ``ASOF LEFT JOIN`` (independent implementation, not the
window oracle), the binned range join against a brute-force Python scan,
and the rollup's day/hour consistency invariant."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_asof_join_matches_duckdb_native_asof(spark):
    from extract_ocr_spark.operators.temporal import asof_join_query

    got = [(r["click_id"], r["view_id"])
           for r in asof_join_query(spark, SF).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    native = con.sql("""
        WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
             v AS (SELECT * FROM events WHERE event_type = 'view')
        SELECT c.event_id, v.event_id
        FROM c ASOF LEFT JOIN v
          ON c.user_id = v.user_id AND v.ts <= c.ts
        ORDER BY c.event_id
    """).fetchall()
    assert got == native


def test_asof_join_equal_ts_matches_and_other_types_ignored(spark, tmp_path):
    from extract_ocr_spark.operators.temporal import asof_join_query

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view at t0, click at the SAME instant -> matches (<=)
        (0, t0, 1, "view"), (1, t0, 1, "click"),
        # user 2: only an 'error' precedes the click -> no match
        (2, t0, 2, "error"), (3, t0 + dt.timedelta(seconds=5), 2, "click"),
        # user 3: two views; the LATER one wins
        (4, t0, 3, "view"), (5, t0 + dt.timedelta(seconds=1), 3, "view"),
        (6, t0 + dt.timedelta(seconds=2), 3, "click"),
        # user 4: view strictly AFTER the click -> no match
        (7, t0 + dt.timedelta(seconds=9), 4, "view"),
        (8, t0, 4, "click"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, k, 1.0, "{}") for i, ts, u, k in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string")
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {r["click_id"]: (r["view_id"], r["gap_us"])
           for r in asof_join_query(spark, str(tmp_path)).collect()}
    assert got == {1: (0, 0), 3: (None, None), 6: (5, 1_000_000),
                   8: (None, None)}


def test_range_join_bins_matches_bruteforce(spark):
    from extract_ocr_spark.operators.temporal import (
        _tiers,
        range_join_bins_query,
    )

    got = sorted((r["event_id"], r["tier_id"])
                 for r in range_join_bins_query(spark, SF).collect())
    con = duckdb.connect()
    vals = con.sql(
        f"SELECT event_id, value FROM '{SF}/events.parquet'").fetchall()
    expect = sorted((e, t) for e, v in vals
                    for t, lo, hi in _tiers() if lo <= v < hi)
    assert got == expect
    # the overlap is real: some events land in two tiers
    from collections import Counter
    per_event = Counter(e for e, _ in got)
    assert max(per_event.values()) == 2


def test_hypertable_rollup_day_rows_roll_up_hours(spark):
    from extract_ocr_spark.operators.temporal import hypertable_rollup_query

    df = hypertable_rollup_query(spark, SF).collect()
    days = {(r["event_type"], r["day"]): r for r in df if r["hour"] is None}
    hours = [r for r in df if r["hour"] is not None]
    assert days and hours
    # events and cents are additive hour->day; n_users is NOT (distinct)
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    for r in hours:
        k = (r["event_type"], r["day"])
        agg[k][0] += r["n_events"]
        agg[k][1] += r["cents"]
    for k, (n, c) in agg.items():
        assert days[k]["n_events"] == n
        assert days[k]["cents"] == c
        assert days[k]["n_users"] <= n


def test_synthetic_events_df_deterministic_shape(spark):
    from extract_ocr_spark.datagen import synthetic_events_df

    df = synthetic_events_df(spark, 1000, partitions=4)
    rows = df.collect()
    assert len(rows) == 1000
    assert df.columns == ["event_id", "ts", "user_id", "event_type",
                          "value", "props"]
    kinds = {r["event_type"] for r in rows}
    assert kinds == {"click", "error", "purchase", "signup", "view"}
    assert all(0 <= r["value"] < 490 for r in rows)
    assert all(0 <= r["user_id"] < 1000 // 67 for r in rows)
    # event_id order implies ts order (30-day spread, jitter < step)
    ts = [r["ts"] for r in sorted(rows, key=lambda r: r["event_id"])]
    assert ts == sorted(ts)
    # deterministic: same rows on a second build
    again = synthetic_events_df(spark, 1000, partitions=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_event_funnel_branch_edges(spark, tmp_path):
    """Pins every fold transition the funnel can take, including the case
    that separates the fold from a naive 'any view<click<purchase chain'
    reading: the stage-2 boundary is the FIRST qualifying click, so a
    later click cannot re-open the purchase window."""
    from extract_ocr_spark.operators.temporal import (
        FUNNEL_WINDOW_US, event_funnel_query)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    W = dt.timedelta(microseconds=FUNNEL_WINDOW_US)
    eps = dt.timedelta(seconds=1)
    rows = [
        # user 1: full chain inside the windows -> 3
        (0, t0, 1, "view"), (1, t0 + eps, 1, "click"),
        (2, t0 + 2 * eps, 1, "purchase"),
        # user 2: click arrives after the view window expired -> 1
        (3, t0, 2, "view"), (4, t0 + W + eps, 2, "click"),
        # user 3: a LATER view restarts the window; click then lands -> 2
        (5, t0, 3, "view"), (6, t0 + W, 3, "view"),
        (7, t0 + W + eps, 3, "click"),
        # user 4: purchase ties to the FIRST qualifying click; the second
        # click cannot move the boundary -> 2 (naive chain logic says 3)
        (8, t0, 4, "view"), (9, t0 + eps, 4, "click"),
        (10, t0 + 2 * eps, 4, "click"),
        (11, t0 + eps + W + eps, 4, "purchase"),
        # user 5: click/purchase with no prior view -> 0
        (12, t0, 5, "click"), (13, t0 + eps, 5, "purchase"),
        # user 6: stage 3 then another view cannot lower it -> 3
        (14, t0, 6, "view"), (15, t0 + eps, 6, "click"),
        (16, t0 + 2 * eps, 6, "purchase"), (17, t0 + 3 * eps, 6, "view"),
        # user 7: purchase BEFORE the click in sequence -> 2
        (18, t0, 7, "view"), (19, t0 + eps, 7, "purchase"),
        (20, t0 + 2 * eps, 7, "click"),
        # user 8: purchase exactly AT the window edge (<=) -> 3
        (21, t0, 8, "view"), (22, t0 + eps, 8, "click"),
        (23, t0 + eps + W, 8, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, k, 1.0, "{}") for i, ts, u, k in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string")
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {r["user_id"]: r["funnel_stage"]
           for r in event_funnel_query(spark, str(tmp_path)).collect()}
    assert got == {1: 3, 2: 1, 3: 2, 4: 2, 5: 0, 6: 3, 7: 2, 8: 3}


def test_event_funnel_matches_python_fold_on_real_events(spark):
    """Cross-checks the Spark fold against a plain Python simulation over
    the real sf0.001 events (the oracle is a window-based derivation, so
    this closes the triangle: fold == simulation == window form)."""
    from extract_ocr_spark.operators.temporal import (
        FUNNEL_WINDOW_US, event_funnel_query)

    got = {r["user_id"]: r["funnel_stage"]
           for r in event_funnel_query(spark, SF).collect()}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    rows = con.sql("SELECT user_id, ts, event_id, event_type FROM events "
                   "ORDER BY user_id, ts, event_id").fetchall()
    code = {"view": 1, "click": 2, "purchase": 3}
    epoch = dt.datetime(1970, 1, 1)
    acc = {}
    for uid, ts, eid, et in rows:
        t = int((ts - epoch).total_seconds() * 1_000_000)
        c = code.get(et, 0)
        a = acc.get(uid, (0, 0))
        if c == 1 and a[0] <= 1:
            a = (1, t)
        elif c == 2 and a[0] == 1 and t - a[1] <= FUNNEL_WINDOW_US:
            a = (2, t)
        elif c == 3 and a[0] == 2 and t - a[1] <= FUNNEL_WINDOW_US:
            a = (3, t)
        acc[uid] = a
    assert got == {u: a[0] for u, a in acc.items()}


def test_ema_value_hand_computed(spark, tmp_path):
    """Seeded fold semantics: ema_0 = v_0, ema_i = 0.75·ema + 0.25·v_i
    over the (ts, event_id) order; a single-event user returns its
    value unchanged."""
    from extract_ocr_spark.operators.temporal import ema_value_query

    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0, 0), 8.0),
        (2, 1, dt.datetime(2024, 1, 1, 0, 1, 0), 4.0),
        (3, 1, dt.datetime(2024, 1, 1, 0, 2, 0), 16.0),
        (4, 2, dt.datetime(2024, 1, 1, 0, 0, 0), 3.5),
        # same ts as event 1 but later event_id: order totalized by id
        (5, 3, dt.datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (6, 3, dt.datetime(2024, 1, 1, 0, 0, 0), 2.0),
    ]
    df = spark.createDataFrame(
        [(e, t, u, "click", v, "{}") for (e, u, t, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {r["user_id"]: (r["n_events"], r["ema_value"])
           for r in ema_value_query(spark, str(tmp_path)).collect()}
    # user 1: 8 -> 0.75*8+0.25*4 = 7 -> 0.75*7+0.25*16 = 9.25
    assert got[1] == (3, 9.25)
    assert got[2] == (1, 3.5)
    # user 3: 1 -> 0.75*1+0.25*2 = 1.25 (event_id breaks the ts tie)
    assert got[3] == (2, 1.25)


def test_ema_value_plan_one_exchange_no_join_no_python(spark):
    """The sequential op stays an ordered fold: exactly one shuffle (on
    user_id), no join operator, nothing drops to Python."""
    from extract_ocr_spark.operators.temporal import ema_value_query

    df = ema_value_query(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one hash exchange for the groupBy + the presentation-level range
    # partitioning for orderBy
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_attribution_linear_fixture_semantics(spark, tmp_path):
    """Pin the split math on a crafted corpus: a purchase with two
    in-window touches credits each channel half its value; an in-window
    third touch of the same channel shifts to thirds; a touch outside
    the 6h window is ignored; a touch-less purchase credits 'direct' in
    full; a same-timestamp touch with a LOWER event_id still counts."""
    import datetime as dt

    from extract_ocr_spark.operators.temporal import (
        ATTR_WINDOW_US,
        attribution_linear_query,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)

    rows = [
        # u1: view(-2h), click(-1h) -> purchase 10.00 at t0 (50/50)
        (1, t0 - 2 * h, 1, "view", 0.0, "{}"),
        (2, t0 - 1 * h, 1, "click", 0.0, "{}"),
        (3, t0, 1, "purchase", 10.00, "{}"),
        # u2: view 7h before -> OUTSIDE window -> direct
        (4, t0 - 7 * h, 2, "view", 0.0, "{}"),
        (5, t0, 2, "purchase", 5.00, "{}"),
        # u3: no touches at all -> direct
        (6, t0, 3, "purchase", 2.00, "{}"),
        # u4: same-ts touch with lower event_id counts, plus one earlier
        (7, t0 - 1 * h, 4, "view", 0.0, "{}"),
        (8, t0, 4, "signup", 0.0, "{}"),
        (9, t0, 4, "purchase", 9.00, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
              " event_type string, value double, props string")
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {r["channel"]: (r["touches"], r["credit_cents"])
           for r in attribution_linear_query(spark, str(tmp_path)).collect()}

    assert got["direct"] == (2, 700.0)          # u2 (window miss) + u3
    assert got["click"] == (1, 500.0)           # half of u1's 10.00
    # view: half of u1 + half of u4; signup: the same-ts touch of u4
    assert got["view"] == (2, 500.0 + 450.0)
    assert got["signup"] == (1, 450.0)
    assert ATTR_WINDOW_US == 6 * 3600 * 1_000_000


def test_gap_fill_daily_fixture_semantics(spark, tmp_path):
    """Calendar densification + forward fill: two same-day purchases sum,
    interior gap days carry the island head's spend with is_gap set and
    the day offset, fill stops the day before the next active day, a
    single-purchase user emits exactly one row, and non-purchase events
    are ignored."""
    from extract_ocr_spark.operators.temporal import gap_fill_daily_query

    t = lambda d, h=12: dt.datetime(2024, 3, d, h, 0, 0)
    rows = [
        # user 10: days 1 (x2) and 4 -> gaps on 2, 3
        (0, t(1, 9), 10, "purchase", 10.00), (1, t(1, 15), 10, "purchase", 2.50),
        (2, t(4), 10, "purchase", 4.00),
        # a view must not create an active day
        (3, t(2), 10, "view", 99.0),
        # user 11: single purchase -> one row, no fill
        (4, t(7), 11, "purchase", 1.00),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, k, v, "{}") for i, ts, u, k, v in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string")
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = [tuple(r) for r in
           gap_fill_daily_query(spark, str(tmp_path)).collect()]
    d_ = dt.date
    assert got == [
        (10, d_(2024, 3, 1), False, 1250, 1250, 0),
        (10, d_(2024, 3, 2), True, 0, 1250, 1),
        (10, d_(2024, 3, 3), True, 0, 1250, 2),
        (10, d_(2024, 3, 4), False, 400, 400, 0),
        (11, d_(2024, 3, 7), False, 100, 100, 0),
    ]


def test_gap_fill_daily_plan_no_join_two_exchanges(spark):
    """Scale pins: densification is agg + window + map-side explode —
    no join (no calendar dimension), no Python, and exactly two hash
    exchanges ((user, day) aggregate, then the user window)."""
    from extract_ocr_spark.operators.temporal import gap_fill_daily_df

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = gap_fill_daily_df(ev)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
