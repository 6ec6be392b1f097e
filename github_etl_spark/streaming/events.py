"""Event-time streaming operators (SURVEY.md §2.9 T5 — IMPLIED set).

The batch catalog proves the window semantics against the DuckDB oracle
(t5_tumbling_window_agg, w4_sessionize); this module provides the
streaming forms with watermarks, late-data drop, and stateful dedup —
the pieces that only exist in `readStream` land.

Scale notes: all three are keyed-state operators; state size is bounded
by the watermark horizon (Spark evicts state older than the watermark),
which is the knob that makes them viable on an unbounded 100 TB/day
stream. Output mode `append` emits a window only once it is final —
the right contract for a downstream warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "10 minutes",
    key: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts per key (T5).

    Late rows beyond `watermark` are dropped; each (window, key) row is
    emitted exactly once in append mode when the watermark passes the
    window end. Partial (map-side) aggregation still applies before the
    keyed-state shuffle.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key,
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Session windows per user: a session closes after `gap` of
    inactivity (the streaming form of the batch w4_sessionize query,
    which computes the same thing with lag + cumulative sum)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key,
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming dedup on event ids, state bounded by the
    watermark (`dropDuplicatesWithinWatermark`) — the streaming form of
    exact dedup: at-least-once upstream → effectively-once downstream
    without unbounded state."""
    keys = keys or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def clicks_to_purchases_join(
    clicks: DataFrame,
    purchases: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join (T5): each click pairs
    with that user's purchases occurring within `within` AFTER it.

    Both sides are watermarked and the join condition bounds event time
    on both ends, so Spark can compute how long each side's state must
    be retained (click state: `within` + watermark; purchase state:
    watermark) and evict it — the state-bound that makes a
    stream-stream join viable on an unbounded stream. Without the time
    bound Spark would have to keep every row forever.
    """
    c = clicks.withWatermark(ts_col, watermark).select(
        F.col(key).alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    p = purchases.withWatermark(ts_col, watermark).select(
        F.col(key).alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )


# ------------------------------------------------------------ fold replays
#
# The live operators above are pass(T)-only by nature (readStream has
# no DuckDB analog). These replays make their EVENT-TIME semantics —
# the late-data drop against a per-batch watermark and the append-mode
# emission schedule — oracle-visible as deterministic batch folds over
# an arrival-batch column, the same treatment the stateful MG /
# bottom-k / running-total folds got (plans/ext.py streaming_*_replay).
# pytest pins each replay to the live streaming operator on the same
# micro-batch sequence (tests/test_streaming.py).


def tumbling_replay(
    events: DataFrame,
    batch_col: str,
    ts_col: str = "ts",
    delay: str = "2 hours",
    key: str = "event_type",
) -> DataFrame:
    """Deterministic replay of ``tumbling_counts``' watermark fold.

    Spark's event-time contract, replayed batch-by-batch: the
    watermark DURING batch b is max(event time over batches < b) −
    ``delay`` (NULL for the first batch — no watermark yet); a row is
    aggregated iff its WINDOW END is above that watermark (a window at
    or below it has been evicted, so the row is dropped); in append
    mode a (window, key) row is emitted in the first batch whose
    watermark exceeds the window end. Termination flushes once more
    with the watermark over ALL batches (probed live: availableNow
    emits state the final watermark finalizes even with no trailing
    data batch), so the replay appends a terminal flush row
    (batch = max+1); windows even the terminal watermark never passed
    are still open and emit nothing (emitted_batch NULL).

    Scale shape: the watermark table is ONE row per batch (a bounded
    window over it is fine), broadcast to the row filter and to the
    emission probe; the only corpus-width work is one keyed groupBy —
    identical to the live operator's partial-agg + keyed-state
    shuffle.
    """
    from pyspark.sql import Window

    bstats = events.groupBy(F.col(batch_col).alias("__b")).agg(
        F.max(ts_col).alias("__bmax")
    )
    ww = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    wm = bstats.select(
        "__b",
        (F.max("__bmax").over(ww) - F.expr(f"INTERVAL {delay}")).alias("__wm"),
    ).unionByName(
        # terminal flush: the watermark over ALL batches, emitted-only
        # (no rows carry this batch id, so the kept-filter join is
        # unaffected)
        bstats.agg(
            (F.max("__b") + 1).alias("__b"),
            (F.max("__bmax") - F.expr(f"INTERVAL {delay}")).alias("__wm"),
        )
    )
    ws = F.date_trunc("hour", F.col(ts_col))
    kept = (
        events.select(
            F.col(batch_col).alias("__b"),
            ws.alias("window_start"),
            (ws + F.expr("INTERVAL 1 HOUR")).alias("window_end"),
            F.col(key),
        )
        .join(F.broadcast(wm), "__b")
        .where(F.col("__wm").isNull() | (F.col("window_end") > F.col("__wm")))
    )
    agg = kept.groupBy("window_start", "window_end", key).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    emit = wm.where(F.col("__wm").isNotNull()).select(
        F.col("__b").alias("__eb"), F.col("__wm").alias("__ewm")
    )
    return (
        agg.join(
            F.broadcast(emit), F.col("__ewm") > F.col("window_end"), "left"
        )
        .groupBy("window_start", "window_end", key, "n_events")
        .agg(F.min("__eb").cast("int").alias("emitted_batch"))
    )


def interval_join_replay(
    clicks: DataFrame,
    purchases: DataFrame,
    batch_col: str,
    ts_col: str = "ts",
    key: str = "user_id",
    within: str = "1 hour",
    delay: str = "2 hours",
) -> DataFrame:
    """Deterministic replay of ``clicks_to_purchases_join``'s
    watermarked stream-stream interval join.

    The semantics, PROBED LIVE rather than assumed (the pin test
    threads the same micro-batches through the real readStream
    operator): Spark does NOT pre-filter late input rows on a
    stream-stream join — a late row still joins whatever state is
    live — and state eviction LAGS one batch: at the end of batch k
    the store drops rows the watermark *during* k (computed from
    batches < k, min across sources, − ``delay``) dominates. So a
    cross-batch pair (earlier row in batch e, later in batch l > e)
    is emitted iff the earlier row survived the evictions at the ends
    of batches e..l-1 — monotone watermark, so exactly iff it beats
    wm_{l-1}: a click survives while click_ts + ``within`` ≥ wm (it
    can still match), a purchase while purchase_ts ≥ wm. Same-batch
    pairs always emit.

    Scale shape: the watermark table is one row per batch (broadcast
    twice — once per side's survival probe); the pair join is an
    EQUI-join on ``key`` with the time band and survival checks as
    residual filters — it shuffles on the key like any stream-stream
    join, never a cartesian.
    """
    from pyspark.sql import Window

    def _bmax(df, name):
        return df.groupBy(F.col(batch_col).alias("__b")).agg(
            F.max(ts_col).alias(name)
        )

    # Per-SOURCE running max over prior batches, THEN min across
    # sources (Spark's policy applies min to each source's own
    # watermark, not per-batch): a source with no data yet has no
    # watermark, which holds the global one back entirely (NULL here).
    batches = (
        clicks.select(F.col(batch_col).alias("__b"))
        .unionByName(purchases.select(F.col(batch_col).alias("__b")))
        .distinct()
    )
    per_b = batches.join(_bmax(clicks, "__cm"), "__b", "left").join(
        _bmax(purchases, "__pm"), "__b", "left"
    )
    ww = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    crun = F.max("__cm").over(ww)
    prun = F.max("__pm").over(ww)
    wm = per_b.select(
        "__b",
        F.when(crun.isNull() | prun.isNull(), F.lit(None))
        .otherwise(F.least(crun, prun) - F.expr(f"INTERVAL {delay}"))
        .alias("__wm"),
    )

    c = clicks.select(
        F.col(key).alias("user_id"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
        F.col(batch_col).alias("__cb"),
    )
    p = purchases.select(
        F.col(key).alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col(batch_col).alias("__pb"),
    )
    pairs = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {within}")
        ),
    )
    # survival check against the watermark during the batch BEFORE the
    # later arrival (eviction lags one batch — see docstring)
    probe = wm.select(
        F.col("__b").alias("__wb"), F.col("__wm").alias("__pwm")
    )
    return (
        pairs.join(
            F.broadcast(probe),
            F.greatest("__cb", "__pb") - 1 == F.col("__wb"),
            "left",
        )
        .where(
            (F.col("__cb") == F.col("__pb"))
            | F.col("__pwm").isNull()
            | (
                (F.col("__cb") > F.col("__pb"))
                & (F.col("purchase_ts") >= F.col("__pwm"))
            )
            | (
                (F.col("__pb") > F.col("__cb"))
                & (
                    F.col("click_ts") + F.expr(f"INTERVAL {within}")
                    >= F.col("__pwm")
                )
            )
        )
        .select(
            "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts"
        )
    )
