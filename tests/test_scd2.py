"""SCD2 merge edge semantics with hand-built dimensions."""

from __future__ import annotations

import datetime as dt

from github_etl_spark.operators.scd import END_OF_TIME, scd2_apply

EOT = dt.datetime(2200, 1, 1)
DIM_SCHEMA = (
    "k long, v string, valid_from timestamp, valid_to timestamp, is_current boolean"
)


def _dim(spark, rows):
    return spark.createDataFrame(rows, DIM_SCHEMA)


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts timestamp")


def _apply(spark, dim_rows, upd_rows):
    out = scd2_apply(
        _dim(spark, dim_rows), _upd(spark, upd_rows), "k", "ts", ["v"]
    ).collect()
    return sorted(
        ((r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in out),
        key=lambda t: (t[0], t[2]),
    )


def test_changed_value_closes_current_row(spark):
    t0, t1 = dt.datetime(2026, 1, 1), dt.datetime(2026, 6, 1)
    out = _apply(
        spark,
        [(1, "a", t0, EOT, True)],
        [(1, "b", t1)],
    )
    assert out == [
        (1, "a", t0, t1, False),
        (1, "b", t1, EOT, True),
    ]


def test_noop_update_is_dropped(spark):
    t0, t1 = dt.datetime(2026, 1, 1), dt.datetime(2026, 6, 1)
    out = _apply(spark, [(1, "a", t0, EOT, True)], [(1, "a", t1)])
    assert out == [(1, "a", t0, EOT, True)]  # nothing changed


def test_new_key_inserts_current(spark):
    t1 = dt.datetime(2026, 6, 1)
    out = _apply(spark, [], [(2, "x", t1)])
    assert out == [(2, "x", t1, EOT, True)]


def test_multi_update_batch_orders_versions(spark):
    t0 = dt.datetime(2026, 1, 1)
    t1, t2 = dt.datetime(2026, 3, 1), dt.datetime(2026, 7, 1)
    out = _apply(
        spark,
        [(1, "a", t0, EOT, True)],
        [(1, "c", t2), (1, "b", t1)],  # out of order on purpose
    )
    assert out == [
        (1, "a", t0, t1, False),
        (1, "b", t1, t2, False),
        (1, "c", t2, EOT, True),
    ]


def test_untouched_keys_and_history_pass_through(spark):
    t0, th, t1 = (
        dt.datetime(2025, 1, 1),
        dt.datetime(2025, 6, 1),
        dt.datetime(2026, 6, 1),
    )
    dim = [
        (1, "old", t0, th, False),  # history row
        (1, "cur", th, EOT, True),
        (2, "zzz", t0, EOT, True),  # untouched key
    ]
    out = _apply(spark, dim, [(1, "new", t1)])
    assert out == [
        (1, "old", t0, th, False),
        (1, "cur", th, t1, False),
        (1, "new", t1, EOT, True),
        (2, "zzz", t0, EOT, True),
    ]


def test_end_of_time_constant():
    # Must stay inside pandas datetime64[ns] range (max 2262-04-11):
    # the correctness driver canonicalizes via toPandas(), and a
    # 9999-12-31 sentinel raises ArrowInvalid there.
    assert END_OF_TIME == "2200-01-01 00:00:00"
    assert dt.datetime.fromisoformat(END_OF_TIME) < dt.datetime(2262, 4, 11)


def test_later_duplicate_updates_are_noops(spark):
    """Review regression: updates identical to the current value at ANY
    position in the batch (not just the first) must not close-and-
    reopen the row."""
    t0 = dt.datetime(2026, 1, 1)
    t1, t2 = dt.datetime(2026, 3, 1), dt.datetime(2026, 7, 1)
    out = _apply(spark, [(1, "a", t0, EOT, True)], [(1, "a", t1), (1, "a", t2)])
    assert out == [(1, "a", t0, EOT, True)]  # fully unchanged


def test_consecutive_inbatch_duplicates_collapse(spark):
    """b@t1, b@t2, c@t3 → the duplicate middle 'b' disappears and the
    first 'b' interval stretches to t3."""
    t0 = dt.datetime(2026, 1, 1)
    t1, t2, t3 = (
        dt.datetime(2026, 2, 1),
        dt.datetime(2026, 4, 1),
        dt.datetime(2026, 6, 1),
    )
    out = _apply(
        spark,
        [(1, "a", t0, EOT, True)],
        [(1, "b", t1), (1, "b", t2), (1, "c", t3)],
    )
    assert out == [
        (1, "a", t0, t1, False),
        (1, "b", t1, t3, False),  # stretched over the dropped duplicate
        (1, "c", t3, EOT, True),
    ]


def test_value_flapping_keeps_every_transition(spark):
    """a → b → a is three real states, not a dedupe opportunity."""
    t0 = dt.datetime(2026, 1, 1)
    t1, t2 = dt.datetime(2026, 3, 1), dt.datetime(2026, 6, 1)
    out = _apply(spark, [(1, "a", t0, EOT, True)], [(1, "b", t1), (1, "a", t2)])
    assert out == [
        (1, "a", t0, t1, False),
        (1, "b", t1, t2, False),
        (1, "a", t2, EOT, True),
    ]
