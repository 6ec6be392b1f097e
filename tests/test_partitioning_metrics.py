"""Salted join equivalence, observable metrics, snapshot compaction."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from github_etl_spark.functions.metrics import with_row_metrics
from github_etl_spark.operators.partitioning import ensure_parallelism, salted_join
from github_etl_spark.sinks.snapshot import (
    compact_snapshot,
    read_snapshot,
    stamp,
)
from github_etl_spark.tables import load_tables


def test_salted_join_matches_plain_join(spark, sf_dir):
    t = load_tables(spark, sf_dir, register=False)
    li = t["lineitem"].withColumnRenamed("l_suppkey", "suppkey").select(
        "suppkey", "l_orderkey", "l_linenumber"
    )
    sup = t["supplier"].withColumnRenamed("s_suppkey", "suppkey").select(
        "suppkey", "s_name"
    )
    plain = li.join(sup, "suppkey").select("l_orderkey", "l_linenumber", "s_name")
    salted = salted_join(li, sup, "suppkey", salt_buckets=4).select(
        "l_orderkey", "l_linenumber", "s_name"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_outer_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    out = salted_join(big, small, "k", salt_buckets=4, how="left").collect()
    assert len(out) == 3
    assert {r.k: r.w for r in out}[99] is None


def test_ensure_parallelism_noop_when_wide(spark):
    df = spark.range(1000).repartition(64)
    assert ensure_parallelism(df) is df  # never narrows, no extra shuffle


def test_observation_metrics(spark, sf_dir):
    t = load_tables(spark, sf_dir, register=False)
    df, obs = with_row_metrics(t["orders"], count_col="o_custkey")
    n = df.count()
    got = obs.get
    assert got["rows"] == n
    assert 0 <= got["null_o_custkey"] <= n


def test_compact_snapshot_merges_files(spark, tmp_path):
    path = str(tmp_path / "pull_requests")
    # Simulate streaming appends: several small file-sets in one partition.
    for batch in range(4):
        df = spark.createDataFrame(
            [(batch * 10 + i, f"t{i}") for i in range(3)],
            "pull_request_id long, title string",
        )
        stamp(df, "acme/widgets", "2026-01-15").repartition(2).write.mode(
            "append"
        ).partitionBy("target_repository", "snapshot_date").parquet(path)

    part_glob = f"{path}/target_repository=*/snapshot_date=2026-01-15/*.parquet"
    before = len(glob.glob(part_glob))
    assert before >= 8
    rows_before = sorted(
        r.pull_request_id for r in read_snapshot(spark, path).collect()
    )

    compact_snapshot(spark, path, "acme/widgets", "2026-01-15", target_files=1)
    after = len(glob.glob(part_glob))
    assert after == 1
    rows_after = sorted(
        r.pull_request_id for r in read_snapshot(spark, path).collect()
    )
    assert rows_after == rows_before


def test_compact_streaming_layout_rerunnable(spark, tmp_path):
    """Streaming layout (ingest_batch dirs): compaction collapses into
    one negative-id dir, preserves rows, keeps the table readable, and
    a second compaction after new batches keeps earlier compacted rows.
    """
    import glob as _glob

    path = str(tmp_path / "pull_requests")

    def _write_batch(batch_id, ids):
        df = spark.createDataFrame(
            [(i, f"t{i}") for i in ids], "pull_request_id long, title string"
        )
        (
            stamp(df, "acme/widgets", "2026-01-15")
            .withColumn("ingest_batch", F.lit(batch_id))
            .repartition(2)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("target_repository", "snapshot_date", "ingest_batch")
            .parquet(path)
        )

    _write_batch(0, [1, 2])
    _write_batch(1, [3])
    compact_snapshot(spark, path, "acme/widgets", "2026-01-15", target_files=1)
    dirs = _glob.glob(f"{path}/*/snapshot_date=2026-01-15/ingest_batch=*")
    assert [d.rsplit("=", 1)[1] for d in dirs] == ["-2"]
    got = sorted(r.pull_request_id for r in read_snapshot(spark, path).collect())
    assert got == [1, 2, 3]

    # New batches arrive after compaction; compact again.
    _write_batch(2, [4, 5])
    compact_snapshot(spark, path, "acme/widgets", "2026-01-15", target_files=1)
    got = sorted(r.pull_request_id for r in read_snapshot(spark, path).collect())
    assert got == [1, 2, 3, 4, 5]  # earlier compacted rows survive
    dirs = _glob.glob(f"{path}/*/snapshot_date=2026-01-15/ingest_batch=*")
    assert [d.rsplit("=", 1)[1] for d in dirs] == ["-3"]

    # Nothing new → no-op.
    compact_snapshot(spark, path, "acme/widgets", "2026-01-15", target_files=1)
    got = sorted(r.pull_request_id for r in read_snapshot(spark, path).collect())
    assert got == [1, 2, 3, 4, 5]
