"""SCD Type-2 merge without a transactional table format.

The reference's warehouse is SCD-type-0 daily snapshots (full reload
per `(repo, date)`); real downstream marts usually want type-2
history — one row per (key, validity interval). Delta/Iceberg express
this as MERGE INTO; on plain parquet the same result is a composition
(the standard emulation): close out changed current rows, append the
new versions, carry everything else.

Shape: one shuffle on the business key for the change join, one window
over (key) in the update set for intra-batch ordering. Both sides
prune columns before the join. At 100 TB the dimension is partitioned
by is_current so the merge reads only current rows plus the update
batch — history partitions are untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# Open-interval sentinel. Deliberately NOT 9999-12-31: pandas/Arrow
# datetime64[ns] tops out at 2262-04-11, so a 9999 sentinel makes any
# toPandas() canonicalization raise ArrowInvalid. 2200-01-01 is far
# enough to be unambiguous and round-trips through every Arrow/pandas
# conversion losslessly.
END_OF_TIME = "2200-01-01 00:00:00"


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    tracked: list[str],
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    `dim` columns: key, tracked..., valid_from, valid_to, is_current.
    `updates` columns: key, tracked..., ts_col (change time).

    Semantics:
    - multiple updates for one key in a batch apply in `ts_col` order
      (each non-final one becomes an already-closed history row);
    - an update whose `tracked` values equal the PRECEDING version's
      (the prior update in the batch, or the key's current dim row for
      the first update) is a no-op and emits no new version — so
      consecutive duplicates never close-and-reopen a row;
    - new keys insert as current rows;
    - untouched keys pass through unchanged.

    Precondition: update timestamps must be newer than the current
    row's `valid_from` (late-arriving updates older than the open
    interval would produce inverted intervals; handling retroactive
    history rewrites is out of scope).

    ``checkpoint_dir``: the survivor batch is materialized once and
    consumed by three branches; by default that is a localCheckpoint
    (executor-local blocks — an executor loss mid-merge kills the
    job). Passing a cluster-visible directory switches to a RELIABLE
    checkpoint() so the merge survives executor loss — worth it when
    the merge is the tail step of a long pipeline whose re-run cost
    dwarfs one small filesystem round-trip.
    """
    # Order the batch per key (tracked columns break timestamp ties
    # deterministically); collapse exact duplicate rows first.
    updates = updates.select(key, *tracked, ts_col).dropDuplicates()
    ordered = updates.select(key, *tracked, F.col(ts_col).alias("valid_from"))
    w = W.partitionBy(key).orderBy(F.col("valid_from"), *[F.col(c) for c in tracked])

    # Value-change detection BEFORE interval computation: compare each
    # update against its predecessor row (lag), with the key's current
    # dim row as virtual row zero. Dropping a middle duplicate this way
    # automatically stretches the previous version's interval when the
    # leads are computed over the SURVIVORS.
    current = dim.filter(F.col("is_current")).select(
        F.col(key),
        F.lit(True).alias("_has_cur"),
        *[F.col(c).alias(f"_cur_{c}") for c in tracked],
    )
    with_prev = ordered.join(current, key, "left").withColumn(
        "_rn", F.row_number().over(w)
    )
    for c in tracked:
        # Explicit _rn guard rather than coalesce(lag, cur): a genuine
        # NULL value in a mid-batch predecessor must compare as NULL,
        # not fall back to the current row.
        with_prev = with_prev.withColumn(
            f"_prev_{c}",
            F.when(F.col("_rn") > 1, F.lag(c).over(w)).otherwise(F.col(f"_cur_{c}")),
        )
    has_prev = (F.col("_rn") > 1) | F.coalesce(F.col("_has_cur"), F.lit(False))
    unchanged = has_prev & _all_equal(tracked, "_prev_")
    survivors = with_prev.filter(~unchanged).drop(
        "_rn",
        "_has_cur",
        *[f"_cur_{c}" for c in tracked],
        *[f"_prev_{c}" for c in tracked],
    )
    # Materialize the survivor batch once: three downstream branches
    # (versions in the output union, first_new for closing rows, and the
    # pass-through anti-join) would otherwise each recompute the whole
    # updates subtree — dedup shuffle, current-row join, and ordering
    # window (measured 8 dim scans / 6 update scans in one plan, ~2.8×
    # cold latency at sf0.1). The batch is the SMALL side of a merge
    # (update set, not the dimension), so local checkpoint storage is
    # bounded. Eager: a lazy checkpoint still lets the union's branch
    # stages race and recompute the subtree before any partition is
    # cached (measured 2.8s vs 1.7s cold at sf0.1), so pay the batch
    # computation once, up front.
    if checkpoint_dir is not None:
        from ..session import scoped_checkpoint_dir

        # Scoped: the eager checkpoint completes inside the context and
        # the session-global dir is restored, so this per-call choice
        # never leaks into later operators' checkpoint selection.
        with scoped_checkpoint_dir(dim.sparkSession, checkpoint_dir):
            survivors = survivors.checkpoint(eager=True)
    else:
        survivors = survivors.localCheckpoint(eager=True)

    versions = survivors.withColumn(
        "valid_to",
        F.coalesce(
            F.lead("valid_from").over(w), F.lit(END_OF_TIME).cast("timestamp")
        ),
    ).withColumn(
        "is_current", F.col("valid_to") == F.lit(END_OF_TIME).cast("timestamp")
    )

    # Close the previously-current row of each key that has real changes:
    # its valid_to becomes the first new version's valid_from. first_new
    # doubles as the changed-key set for the pass-through anti-join.
    first_new = versions.groupBy(key).agg(F.min("valid_from").alias("_new_from"))
    closed = (
        dim.filter(F.col("is_current"))
        .join(first_new, key)
        .withColumn("valid_to", F.col("_new_from"))
        .withColumn("is_current", F.lit(False))
        .drop("_new_from")
    )
    untouched_history = dim.filter(~F.col("is_current"))
    untouched_current = dim.filter(F.col("is_current")).join(
        first_new.select(key), key, "left_anti"
    )

    cols = [key, *tracked, "valid_from", "valid_to", "is_current"]
    return (
        untouched_history.select(cols)
        .unionByName(untouched_current.select(cols))
        .unionByName(closed.select(cols))
        .unionByName(versions.select(cols))
    )


def _all_equal(tracked: list[str], prefix: str = "_cur_"):
    """NULL-safe conjunction: every tracked column equals its
    ``prefix``-twin."""
    cond = None
    for c in tracked:
        eq = F.col(c).eqNullSafe(F.col(f"{prefix}{c}"))
        cond = eq if cond is None else (cond & eq)
    return cond


def scd2_as_of(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time view of an SCD2 dimension: the one version of each
    key whose validity interval covers ``ts`` (half-open
    [valid_from, valid_to)). Keys whose first version starts after
    ``ts`` simply don't appear — time travel, not imputation.

    Pure filter — no shuffle. The filter touches only valid_from /
    valid_to, so an is_current partition layout is NOT pruned by it;
    for current-timestamp probes add `.filter("is_current")` yourself
    (equivalent for ts >= max(valid_from), and it prunes), or rely on
    parquet min/max zone maps over valid_to to skip history files."""
    ts_lit = F.lit(ts).cast("timestamp")
    return dim.filter((F.col("valid_from") <= ts_lit) & (F.col("valid_to") > ts_lit))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    tracked: list[str],
) -> DataFrame:
    """Change-data capture between two full snapshots of the same
    keyed table: one row per changed key with ``change_type`` in
    {insert, update, delete}; unchanged keys are dropped.

    The reference's warehouse is full per-(repo, date) snapshots — this
    is the derived op that turns two of them into a change feed (what a
    downstream incremental consumer actually wants). One shuffle: a
    full-outer join on the key; tracked-column comparison is NULL-safe,
    so NULL→value and value→NULL both read as updates. Output carries
    both sides' values (old_*/new_*) for audit.
    """
    o = old.select(
        F.col(key), *[F.col(c).alias(f"old_{c}") for c in tracked]
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        F.col(key), *[F.col(c).alias(f"new_{c}") for c in tracked]
    ).withColumn("_in_new", F.lit(True))
    joined = o.join(n, key, "full_outer")
    # Empty `tracked` degrades to a key-presence diff: insert/delete
    # only, never update (True is the identity of the conjunction).
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            key,
            "change_type",
            *[f"old_{c}" for c in tracked],
            *[f"new_{c}" for c in tracked],
        )
    )
