"""Funnel / cohort-retention operators (operators/funnel.py).

Edge semantics pinned by hand: strict > between steps (equal
timestamps cannot chain), out-of-order events don't count, unreached
steps are NULL; cross-engine value parity is the driver-sim oracle's
job (funnel_conversion / cohort_retention)."""

from __future__ import annotations

from datetime import datetime

from github_etl_spark.operators.funnel import cohort_retention, funnel_stages


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def T(s):
    return datetime.fromisoformat(s)


def test_funnel_ordered_and_unordered(spark):
    df = _ev(
        spark,
        [
            # full ordered funnel
            (1, T("2024-01-01T10:00"), "view"),
            (1, T("2024-01-01T11:00"), "click"),
            (1, T("2024-01-01T12:00"), "purchase"),
            # purchase BEFORE view: only stage 1 reached
            (2, T("2024-01-01T09:00"), "purchase"),
            (2, T("2024-01-01T10:00"), "view"),
            # click with no prior view: stage 0 (present but unconverted)
            (3, T("2024-01-01T10:00"), "click"),
        ],
    )
    got = {r.user_id: r for r in funnel_stages(df, ["view", "click", "purchase"]).collect()}
    assert got[1].funnel_stage == 3 and got[1].t3 == T("2024-01-01T12:00")
    assert got[2].funnel_stage == 1 and got[2].t2 is None and got[2].t3 is None
    assert got[3].funnel_stage == 0 and got[3].t1 is None


def test_funnel_equal_timestamps_do_not_chain(spark):
    df = _ev(
        spark,
        [
            (1, T("2024-01-01T10:00"), "view"),
            (1, T("2024-01-01T10:00"), "click"),  # same instant: no chain
            (1, T("2024-01-01T11:00"), "click"),
        ],
    )
    row = funnel_stages(df, ["view", "click", "purchase"]).collect()[0]
    assert row.funnel_stage == 2
    assert row.t2 == T("2024-01-01T11:00")  # the LATER click, not the tie


def test_funnel_takes_earliest_qualifying_step(spark):
    df = _ev(
        spark,
        [
            (1, T("2024-01-01T10:00"), "view"),
            (1, T("2024-01-01T12:00"), "view"),  # later view ignored
            (1, T("2024-01-01T11:00"), "click"),
            (1, T("2024-01-01T13:00"), "click"),  # later click ignored
        ],
    )
    row = funnel_stages(df, ["view", "click", "purchase"]).collect()[0]
    assert row.t1 == T("2024-01-01T10:00") and row.t2 == T("2024-01-01T11:00")


def test_cohort_retention_offsets(spark):
    df = _ev(
        spark,
        [
            (1, T("2024-01-01T10:00"), "signup"),  # Mon week 0
            (1, T("2024-01-10T10:00"), "click"),   # next week → offset 1
            (2, T("2024-01-03T10:00"), "signup"),  # same cohort week
            (2, T("2023-12-25T10:00"), "view"),    # BEFORE signup → dropped
        ],
    )
    rows = {
        (r.cohort_week, r.week_offset): r.n_active
        for r in cohort_retention(df, "signup").collect()
    }
    wk = T("2024-01-01T00:00")
    assert rows[(wk, 0)] == 2  # both active in cohort week (the signup itself)
    assert rows[(wk, 1)] == 1  # only user 1 returned
    assert all(off >= 0 for (_, off) in rows)


# ---------------------------------------------------------- differential


def _funnel_reference(events, steps):
    """Brute-force per-user reference: walk time-sorted events, take
    step k's first occurrence strictly after step k-1's time."""
    by_user = {}
    for uid, ts, et in events:
        if et in steps:
            by_user.setdefault(uid, []).append((ts, et))
    out = {}
    for uid, evs in by_user.items():
        t = [None] * len(steps)
        for ts, et in sorted(evs):
            for k, s in enumerate(steps):
                if t[k] is None and et == s and (k == 0 or (t[k - 1] is not None and ts > t[k - 1])):
                    # only the NEXT unreached step may fire, and only once
                    if k == 0 or t[k - 1] is not None:
                        t[k] = ts
                    break
        stage = 0
        for k in range(len(steps)):
            if t[k] is not None:
                stage = k + 1
        out[uid] = (tuple(t), stage)
    return out


def test_funnel_differential_random_streams(spark):
    from hypothesis import given, settings, strategies as st

    steps = ["view", "click", "purchase"]
    ev = st.tuples(
        st.integers(min_value=1, max_value=5),                      # user
        st.integers(min_value=0, max_value=20),                     # coarse ts → ties likely
        st.sampled_from(steps + ["error"]),                         # noise type too
    )

    @settings(max_examples=10, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=40))
    def run(rows):
        data = [(u, T("2024-01-01T00:00") .replace(minute=m), et) for u, m, et in rows]
        got = {
            r.user_id: ((r.t1, r.t2, r.t3), r.funnel_stage)
            for r in funnel_stages(_ev(spark, data), steps).collect()
        }
        want = _funnel_reference(data, steps)
        assert got == want

    run()


def test_event_pattern_match_semantics(spark, tmp_path):
    """'v+cp' requires ADJACENT view-run -> click -> purchase; an
    intervening error breaks it (exactly what funnel subsequence
    semantics would still count). Non-overlapping count + 1-based
    leftmost position."""
    import pyarrow as pa

    from tests.conftest import sf_dir_with_table

    # user 1: v v c p v c p  -> matches at pos 1 ('vvcp') and 5 ('vcp')
    # user 2: v e c p        -> error breaks adjacency, no match
    types = {
        1: ["view", "view", "click", "purchase", "view", "click", "purchase"],
        2: ["view", "error", "click", "purchase"],
    }
    rows = []
    eid = 0
    for uid, ts_types in types.items():
        for i, ty in enumerate(ts_types):
            rows.append((eid, 1_700_000_000_000_000 + i * 60_000_000, uid, ty))
            eid += 1
    sf = sf_dir_with_table(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    }))
    from github_etl_spark.plans import QUERIES

    got = {r["user_id"]: r.asDict()
           for r in QUERIES["event_pattern_match"].fn(spark, sf).collect()}
    assert got[1]["seq_len"] == 7
    assert got[1]["n_matches"] == 2
    assert got[1]["first_match_pos"] == 1
    assert got[2]["n_matches"] == 0 and got[2]["first_match_pos"] == 0


def test_ts_ohlc_bars_open_close_semantics(spark, tmp_path):
    """Open/close are the FIRST/LAST value by (ts, event_id) within
    the hour bar — including the ts-tie case where event_id breaks."""
    import pyarrow as pa

    from tests.conftest import sf_dir_with_table

    # NOT hour-aligned (22:13:20 UTC); all first-bar events stay within
    # the remaining 46 min of hour 22, the fifth lands in the next hour
    base = 1_700_000_000_000_000
    rows = [
        # (event_id, ts_us, value) — one hour bar, ts tie at the end
        (1, base + 60_000_000, 5.0),
        (2, base + 120_000_000, 9.0),
        (3, base + 180_000_000, 1.0),
        (4, base + 180_000_000, 7.0),  # same ts as 3 -> later by id
        # next hour: single event
        (5, base + 3_660_000_000, 2.5),
    ]
    sf = sf_dir_with_table(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([r[2] for r in rows]),
        "props": pa.array(["{}"] * len(rows)),
    }))
    from github_etl_spark.plans import QUERIES

    got = sorted(
        (r.asDict() for r in QUERIES["ts_ohlc_bars"].fn(spark, sf).collect()),
        key=lambda d: d["bar_hour"],
    )
    assert len(got) == 2
    b0 = got[0]
    assert (b0["open"], b0["high"], b0["low"], b0["close"]) == (
        5.0, 9.0, 1.0, 7.0,
    )
    assert b0["n_events"] == 4
    assert b0["sum_value_micros"] == int((5 + 9 + 1 + 7) * 1_000_000)
    b1 = got[1]
    assert b1["open"] == b1["close"] == 2.5 and b1["n_events"] == 1
