"""Idempotent snapshot sink (M2): probe, overwrite, isolation.

Mirrors the reference's load/idempotence behaviors
(tests/test_load_data.py and the main.py:829-839 driver decision)
without copying them: same contract, engine-native mechanism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from github_etl_spark.sinks.snapshot import (
    SnapshotSink,
    read_snapshot,
    snapshot_exists,
    stamp,
    write_snapshot,
)


def _rows(spark, vals):
    return spark.createDataFrame(
        [(i, f"title {i}") for i in vals], "pull_request_id long, title string"
    )


def test_stamp_adds_partition_columns(spark):
    out = stamp(_rows(spark, [1]), "acme/widgets", "2026-01-15").collect()[0]
    assert out.target_repository == "acme/widgets"
    assert str(out.snapshot_date) == "2026-01-15"


def test_write_then_probe_then_read(spark, tmp_path):
    path = str(tmp_path / "pull_requests")
    write_snapshot(stamp(_rows(spark, [1, 2, 3]), "acme/widgets", "2026-01-15"), path)

    assert snapshot_exists(spark, path, "acme/widgets", "2026-01-15")
    assert not snapshot_exists(spark, path, "acme/widgets", "2026-01-16")
    assert not snapshot_exists(spark, path, "other/repo", "2026-01-15")

    back = read_snapshot(spark, path, "acme/widgets", "2026-01-15")
    assert back.count() == 3
    # Partition column round-trips through the %2F directory escaping.
    assert back.select("target_repository").distinct().collect()[0][0] == "acme/widgets"


def test_missing_table_probe_is_false(spark, tmp_path):
    # Reference behavior: missing table → False, not an error (main.py:589-597).
    assert not snapshot_exists(spark, str(tmp_path / "nope"), "r", "2026-01-15")


def test_rerun_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "pull_requests")
    write_snapshot(stamp(_rows(spark, [1, 2, 3]), "acme/widgets", "2026-01-15"), path)
    # Re-load the same partition with different rows — replaces, not appends.
    write_snapshot(stamp(_rows(spark, [7, 8]), "acme/widgets", "2026-01-15"), path)
    back = read_snapshot(spark, path, "acme/widgets", "2026-01-15")
    assert sorted(r.pull_request_id for r in back.collect()) == [7, 8]


def test_overwrite_leaves_other_partitions_alone(spark, tmp_path):
    path = str(tmp_path / "pull_requests")
    write_snapshot(stamp(_rows(spark, [1]), "acme/widgets", "2026-01-15"), path)
    write_snapshot(stamp(_rows(spark, [2]), "other/repo", "2026-01-15"), path)
    write_snapshot(stamp(_rows(spark, [3]), "acme/widgets", "2026-01-16"), path)
    # Overwrite one partition; the other two must survive.
    write_snapshot(stamp(_rows(spark, [9, 10]), "acme/widgets", "2026-01-15"), path)

    all_rows = read_snapshot(spark, path)
    assert all_rows.count() == 4
    assert read_snapshot(spark, path, "other/repo", "2026-01-15").count() == 1
    assert read_snapshot(spark, path, "acme/widgets", "2026-01-16").count() == 1


def test_partition_pruning_in_plan(spark, tmp_path):
    path = str(tmp_path / "pull_requests")
    write_snapshot(stamp(_rows(spark, [1]), "acme/widgets", "2026-01-15"), path)
    plan = (
        read_snapshot(spark, path, "acme/widgets", "2026-01-15")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_sink_four_tables_and_empty_skip(spark, tmp_path):
    sink = SnapshotSink(str(tmp_path / "wh"))
    empty = _rows(spark, [1]).where(F.lit(False))
    sink.load(
        {"pull_requests": _rows(spark, [1, 2]), "commits": empty},
        "acme/widgets",
        "2026-01-15",
    )
    assert sink.exists(spark, "acme/widgets", "2026-01-15")
    assert not sink.exists(spark, "acme/widgets", "2026-01-16")
    # Empty table → no partitions written; the probe reads it as absent
    # (reference main.py:719-723 skips empty row lists — same contract,
    # enforced by dynamic overwrite writing nothing, not by a take(1)
    # pre-scan that would double-execute the transform).
    assert not snapshot_exists(
        spark, sink.path("commits"), "acme/widgets", "2026-01-15"
    )
