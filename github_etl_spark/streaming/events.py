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
