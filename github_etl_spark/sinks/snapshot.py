"""Idempotent partitioned snapshot sink (SURVEY.md §2.1 S6-S9, §2.9 T4).

The reference implements daily-snapshot idempotence imperatively:
probe `(target_repository, snapshot_date)` with `SELECT 1 … LIMIT 1`
(reference main.py:552-601), then `DELETE FROM` each table for that
partition before reloading (main.py:604-638, driver decision
main.py:829-839). That probe-then-delete sequence races under parallel
writers (SURVEY.md §7.4 risk 5).

Spark-first re-expression: the pair IS the physical partition key of a
partitioned parquet layout, and idempotent reload is **dynamic
partition overwrite** — a single atomic-per-partition `overwrite` that
replaces exactly the partitions present in the incoming DataFrame and
leaves every other `(repo, date)` untouched. No delete step, no race
window, and re-running a failed load converges to the same state
(exactly-once per partition).

At 100 TB: the layout keeps per-partition file counts bounded by
repartitioning on the partition key before the write (one shuffle whose
output IS the final file layout — no small-files problem), and reads
with a partition predicate prune to the single partition
(`PartitionFilters` in the scan, zero data read outside it).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The reference's four output tables (data.yml:6-86).
SNAPSHOT_TABLES = ("pull_requests", "commits", "reviewers", "comments")

PARTITION_COLS = ("target_repository", "snapshot_date")


def _date_lit(snapshot_date: str | _dt.date):
    if isinstance(snapshot_date, _dt.date):
        snapshot_date = snapshot_date.isoformat()
    return F.lit(snapshot_date).cast("date")


def stamp(df: DataFrame, repo: str, snapshot_date: str | _dt.date) -> DataFrame:
    """Add the partition columns (P4 repo tag, P5 snapshot date).

    The reference stamps `target_repository` at transform time
    (main.py:461,478,503,525) and `snapshot_date` at load time
    (main.py:725-727), computed once per run (main.py:827) so a run
    crossing midnight stays consistent. We take the date as an explicit
    argument for the same reason — never `current_date()` here.
    """
    return df.withColumn("target_repository", F.lit(repo)).withColumn(
        "snapshot_date", _date_lit(snapshot_date)
    )


def write_snapshot(df: DataFrame, table_path: str) -> None:
    """Write one table's rows with dynamic partition overwrite (S9/T4).

    Only the `(target_repository, snapshot_date)` partitions present in
    `df` are replaced; all other partitions survive. `partitionOverwriteMode`
    is passed as a per-write option so the session conf is untouched.

    The repartition on the partition key is deliberate: it makes each
    final partition directory be written by the tasks that own that key,
    so file count per partition ≈ one per shuffle partition with data,
    not (input partitions × touched partitions) — the classic
    small-files blowup at scale.
    """
    (
        df.repartition(*[F.col(c) for c in PARTITION_COLS])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*PARTITION_COLS)
        .parquet(table_path)
    )


def snapshot_exists(
    spark: SparkSession,
    table_path: str,
    repo: str,
    snapshot_date: str | _dt.date,
) -> bool:
    """Existence probe (S8): partition-pruned `LIMIT 1` scan.

    The reference's `SELECT 1 … LIMIT 1` (main.py:573-579) with its
    missing-table → False behavior (main.py:589-601). Here the filter
    lands on partition columns, so Spark prunes to the one directory and
    the probe reads at most one row-group header — O(1) regardless of
    table size.
    """
    if not os.path.exists(table_path):
        return False
    df = spark.read.parquet(table_path)
    probe = df.where(
        (F.col("target_repository") == repo)
        & (F.col("snapshot_date") == _date_lit(snapshot_date))
    ).limit(1)
    return len(probe.take(1)) > 0


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    repo: str | None = None,
    snapshot_date: str | _dt.date | None = None,
) -> DataFrame:
    """Read a table, optionally pruned to one `(repo, date)` partition."""
    df = spark.read.parquet(table_path)
    if repo is not None:
        df = df.where(F.col("target_repository") == repo)
    if snapshot_date is not None:
        df = df.where(F.col("snapshot_date") == _date_lit(snapshot_date))
    return df


class SnapshotSink:
    """The four-table snapshot warehouse rooted at ``base_dir``.

    `load(tables, repo, snapshot_date)` is the engine's analog of the
    reference's probe→delete→reload driver step (main.py:829-839,
    load_data main.py:686-738): one idempotent dynamic-partition
    overwrite per table, empty tables skipped like the reference's
    empty-rows guard (main.py:719-723).
    """

    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def load(
        self,
        tables: dict[str, DataFrame],
        repo: str,
        snapshot_date: str | _dt.date,
    ) -> None:
        for name, df in tables.items():
            if not df.take(1):
                continue
            write_snapshot(stamp(df, repo, snapshot_date), self.path(name))

    def exists(self, spark: SparkSession, repo: str, snapshot_date: str | _dt.date) -> bool:
        """True if ANY table holds the partition (reference probes only
        `pull_requests`, main.py:571 — we check all four so a partial
        prior failure still reads as present-and-replaceable)."""
        return any(
            snapshot_exists(spark, self.path(t), repo, snapshot_date)
            for t in SNAPSHOT_TABLES
        )


def compact_snapshot(
    spark: SparkSession,
    table_path: str,
    repo: str,
    snapshot_date: str | _dt.date,
    target_files: int = 1,
) -> None:
    """Rewrite one `(repo, date)` partition into `target_files` files.

    The streaming path appends a file-set per micro-batch (S7), which
    accumulates small files; this is the standard post-stream compaction:
    read exactly that partition (pruned scan), coalesce, and replace it
    atomically with the same dynamic-partition-overwrite used for loads.
    Rows are unchanged — only the file layout. At scale, run per
    partition after the stream's snapshot date closes.
    """
    part = read_snapshot(spark, table_path, repo, snapshot_date)
    compacted = part.coalesce(target_files)
    (
        compacted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*PARTITION_COLS)
        .parquet(table_path)
    )
