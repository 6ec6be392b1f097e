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

END_OF_TIME = "9999-12-31 23:59:59"


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    tracked: list[str],
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    `dim` columns: key, tracked..., valid_from, valid_to, is_current.
    `updates` columns: key, tracked..., ts_col (change time).

    Semantics:
    - multiple updates for one key in a batch apply in `ts_col` order
      (each non-final one becomes an already-closed history row);
    - an update identical in all `tracked` columns to the key's current
      row is a no-op (no new version);
    - new keys insert as current rows;
    - untouched keys pass through unchanged.
    """
    # Order the batch per key; keep a closed interval per consecutive
    # pair. Tracked columns break timestamp ties deterministically;
    # exact duplicate update rows are collapsed first.
    updates = updates.select(key, *tracked, ts_col).dropDuplicates()
    versions = updates.select(key, *tracked, F.col(ts_col).alias("valid_from"))
    w = W.partitionBy(key).orderBy(F.col("valid_from"), *[F.col(c) for c in tracked])
    versions = versions.withColumn(
        "valid_to",
        F.coalesce(
            F.lead("valid_from").over(w), F.lit(END_OF_TIME).cast("timestamp")
        ),
    ).withColumn("is_current", F.col("valid_to") == F.lit(END_OF_TIME).cast("timestamp"))

    # Drop no-op updates: the FIRST version of a key is dropped when the
    # key has a current dim row equal in every tracked column. (Later
    # versions still apply — they represent real changes.)
    current = dim.filter(F.col("is_current")).select(
        F.col(key),
        F.lit(True).alias("_has_cur"),
        *[F.col(c).alias(f"_cur_{c}") for c in tracked],
    )
    is_first = F.row_number().over(w) == 1
    noop = F.col("_is_first") & F.coalesce(F.col("_has_cur"), F.lit(False)) & _all_equal(
        tracked
    )
    versions = (
        versions.withColumn("_is_first", is_first)
        .join(current, key, "left")
        .filter(~noop)
        .drop("_is_first", "_has_cur", *[f"_cur_{c}" for c in tracked])
    )

    changed_keys = versions.select(key).distinct()

    # Close the previously-current row of each key that has real changes:
    # its valid_to becomes the first new version's valid_from.
    first_new = versions.groupBy(key).agg(F.min("valid_from").alias("_new_from"))
    closed = (
        dim.join(changed_keys, key, "left_semi")
        .filter(F.col("is_current"))
        .join(first_new, key)
        .withColumn("valid_to", F.col("_new_from"))
        .withColumn("is_current", F.lit(False))
        .drop("_new_from")
    )
    untouched_history = dim.filter(~F.col("is_current"))
    untouched_current = dim.filter(F.col("is_current")).join(
        changed_keys, key, "left_anti"
    )

    cols = [key, *tracked, "valid_from", "valid_to", "is_current"]
    return (
        untouched_history.select(cols)
        .unionByName(untouched_current.select(cols))
        .unionByName(closed.select(cols))
        .unionByName(versions.select(cols))
    )


def _all_equal(tracked: list[str]):
    """NULL-safe conjunction: every tracked column equals its _cur_ twin."""
    cond = None
    for c in tracked:
        eq = F.col(c).eqNullSafe(F.col(f"_cur_{c}"))
        cond = eq if cond is None else (cond & eq)
    return cond
