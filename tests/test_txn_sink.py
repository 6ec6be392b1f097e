"""Transactional commit-log snapshot sink (sinks/txnlog.py).

The ACID contract under test: atomic multi-table commits (no torn
snapshots, ever — even with racing writers and NO lock), snapshot
isolation + time travel, metadata-only existence probe, optimistic
conflict detection, vacuum safety.
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from github_etl_spark.sinks.txnlog import TxnSnapshotSink, WriteConflict

REPO = "octo/widgets"
DAY = "2026-08-13"


def _tables(spark, tag: str, n: int = 10):
    prs = spark.range(n).select(
        F.col("id").alias("pull_request_id"), F.lit(tag).alias("status")
    )
    comments = spark.range(2 * n).select(
        F.col("id").alias("comment_id"), F.lit(tag).alias("body")
    )
    return {"pull_requests": prs, "comments": comments}


def test_commit_read_roundtrip(spark, tmp_path):
    sink = TxnSnapshotSink(str(tmp_path))
    v = sink.load(_tables(spark, "a"), REPO, DAY)
    assert v == 0
    got = sink.read(spark, "pull_requests", REPO, DAY)
    assert got.count() == 10
    assert {r.status for r in got.collect()} == {"a"}
    assert {f.name for f in got.schema.fields} >= {
        "pull_request_id",
        "status",
        "target_repository",
        "snapshot_date",
    }


def test_overwrite_replaces_wholesale_and_time_travel(spark, tmp_path):
    sink = TxnSnapshotSink(str(tmp_path))
    v0 = sink.load(_tables(spark, "a", 10), REPO, DAY)
    v1 = sink.load(_tables(spark, "b", 5), REPO, DAY)
    assert (v0, v1) == (0, 1)
    now = sink.read(spark, "pull_requests", REPO, DAY)
    assert now.count() == 5 and {r.status for r in now.collect()} == {"b"}
    # time travel to v0 still sees writer a
    old = sink.read(spark, "pull_requests", REPO, DAY, version=v0)
    assert old.count() == 10 and {r.status for r in old.collect()} == {"a"}
    assert [c["version"] for c in sink.history()] == [1, 0]


def test_partitions_are_independent(spark, tmp_path):
    sink = TxnSnapshotSink(str(tmp_path))
    sink.load(_tables(spark, "a"), REPO, "2026-08-12")
    sink.load(_tables(spark, "b"), REPO, "2026-08-13")
    sink.load(_tables(spark, "c"), "other/repo", "2026-08-13")
    assert sink.read(spark, "pull_requests", REPO, "2026-08-12").count() == 10
    assert sink.read(spark, "pull_requests").count() == 30
    assert sink.exists(REPO, "2026-08-12")
    assert sink.exists("other/repo", "2026-08-13")
    assert not sink.exists("other/repo", "2026-08-12")


def test_exists_is_metadata_only(spark, tmp_path):
    sink = TxnSnapshotSink(str(tmp_path))
    sink.load(_tables(spark, "a"), REPO, DAY)
    # exists() never touches data files: remove them all, probe still works
    import shutil

    shutil.rmtree(os.path.join(str(tmp_path), "data"))
    assert sink.exists(REPO, DAY)
    assert not sink.exists(REPO, "1999-01-01")


def test_empty_partition_read_returns_empty_frame(spark, tmp_path):
    sink = TxnSnapshotSink(str(tmp_path))
    sink.load(_tables(spark, "a"), REPO, DAY)
    missing = sink.read(spark, "pull_requests", REPO, "1999-01-01")
    assert missing.count() == 0
    assert "pull_request_id" in missing.columns
    with pytest.raises(ValueError):
        sink.read(spark, "never_committed_table")


def test_read_modify_write_conflict(spark, tmp_path):
    sink = TxnSnapshotSink(str(tmp_path))
    v0 = sink.load(_tables(spark, "a"), REPO, DAY)
    sink.load(_tables(spark, "b"), REPO, DAY)  # intervening writer
    with pytest.raises(WriteConflict):
        sink.load(_tables(spark, "c"), REPO, DAY, require_read_version=v0)
    # conflict on a DIFFERENT partition does not fire — rebase instead
    v = sink.load(_tables(spark, "d"), REPO, "2026-08-14", require_read_version=v0)
    assert v == 2
    # and staging of the aborted writer was cleaned up
    data_root = os.path.join(str(tmp_path), "data", "pull_requests")
    live_txids = {
        c["tables"]["pull_requests"][0].split(os.sep)[2] for c in sink.commits()
    }
    assert set(os.listdir(data_root)) == live_txids


def test_concurrent_writers_never_tear(spark, tmp_path):
    """The headline guarantee: N unlocked racing writers to the SAME
    partition; afterwards both tables must come from ONE winner."""
    sink = TxnSnapshotSink(str(tmp_path))
    errs = []

    def writer(tag):
        try:
            sink.load(_tables(spark, tag, 8), REPO, DAY)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(f"w{i}",)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert sink.latest_version() == 3  # all four commits landed, distinct versions
    pr_tags = {r.status for r in sink.read(spark, "pull_requests", REPO, DAY).collect()}
    cm_tags = {r.body for r in sink.read(spark, "comments", REPO, DAY).collect()}
    assert len(pr_tags) == 1 and pr_tags == cm_tags  # untorn: one writer, both tables
    # and the winner is the last commit in the log
    last = sink.history()[0]
    winner_txid = last["txid"]
    assert all(winner_txid in f for f in last["tables"]["pull_requests"])


def test_vacuum_drops_orphans_and_superseded(spark, tmp_path):
    sink = TxnSnapshotSink(str(tmp_path))
    sink.load(_tables(spark, "a"), REPO, DAY)
    sink.load(_tables(spark, "b"), REPO, DAY)
    sink.load(_tables(spark, "c"), REPO, DAY)
    # orphan: staged dir with no commit (simulates a crashed writer)
    orphan = os.path.join(str(tmp_path), "data", "pull_requests", "deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
        f.write("junk")

    removed = sink.vacuum(retain_versions=10)
    assert removed == [os.path.join("data", "pull_requests", "deadbeef")]
    # full retention: all versions still readable
    assert sink.read(spark, "pull_requests", REPO, DAY, version=0).count() == 10

    removed = sink.vacuum(retain_versions=1)
    assert removed  # version-0 files superseded beyond retention
    assert sink.read(spark, "pull_requests", REPO, DAY).count() == 10
    assert sink.read(spark, "pull_requests", REPO, DAY, version=1).count() == 10
    with pytest.raises(Exception):
        sink.read(spark, "pull_requests", REPO, DAY, version=0).count()


def test_log_records_are_wellformed(spark, tmp_path):
    sink = TxnSnapshotSink(str(tmp_path))
    sink.load(_tables(spark, "a"), REPO, DAY)
    log_dir = os.path.join(str(tmp_path), "_txn_log")
    files = sorted(os.listdir(log_dir))
    assert files == ["0" * 20 + ".json"]
    rec = json.load(open(os.path.join(log_dir, files[0])))
    assert rec["version"] == 0 and rec["op"] == "overwrite"
    assert rec["partition"] == {
        "target_repository": REPO,
        "snapshot_date": DAY,
    }
    assert set(rec["tables"]) == {"pull_requests", "comments"}
    assert all(f.endswith(".parquet") for fs in rec["tables"].values() for f in fs)
