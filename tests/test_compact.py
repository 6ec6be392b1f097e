"""Small-file compaction (sinks/compact.py): fragmented partitions are
rewritten to few files, rows preserved exactly, healthy partitions
untouched, re-run idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from github_etl_spark.sinks.compact import compact_partitions, partition_stats


def _write_fragmented(spark, path):
    # partition a: 8 tiny files; partition b: 1 file (healthy)
    a = spark.range(400).select(
        F.col("id"), F.lit("a").alias("part"), (F.col("id") * 2).alias("v")
    )
    a.repartition(8).write.partitionBy("part").mode("append").parquet(path)
    b = spark.range(100).select(
        (F.col("id") + 1000).alias("id"),
        F.lit("b").alias("part"),
        (F.col("id") * 3).alias("v"),
    )
    b.coalesce(1).write.partitionBy("part").mode("append").parquet(path)


def _stats_by_part(path):
    return {
        tuple(sorted(p["partition"].items())): p for p in partition_stats(path)
    }


def test_compact_rewrites_only_fragmented(spark, tmp_path):
    path = os.path.join(str(tmp_path), "tbl")
    _write_fragmented(spark, path)
    before = spark.read.parquet(path)
    rows_before = sorted(before.collect())
    stats = _stats_by_part(path)
    assert stats[(("part", "a"),)]["n_files"] == 8
    b_files_before = stats[(("part", "b"),)]["n_files"]

    rewritten = compact_partitions(spark, path, max_files=4)
    assert [p["partition"] for p in rewritten] == [{"part": "a"}]

    after = spark.read.parquet(path)
    assert sorted(after.collect()) == rows_before  # rows preserved exactly
    stats2 = _stats_by_part(path)
    assert stats2[(("part", "a"),)]["n_files"] <= 4  # compacted
    assert stats2[(("part", "b"),)]["n_files"] == b_files_before  # untouched


def test_compact_idempotent_and_noop_when_healthy(spark, tmp_path):
    path = os.path.join(str(tmp_path), "tbl")
    _write_fragmented(spark, path)
    assert compact_partitions(spark, path, max_files=4) != []
    rows = sorted(spark.read.parquet(path).collect())
    # second run: nothing fragmented anymore
    assert compact_partitions(spark, path, max_files=4) == []
    assert sorted(spark.read.parquet(path).collect()) == rows


def test_compact_target_size_splits_files(spark, tmp_path):
    path = os.path.join(str(tmp_path), "tbl")
    _write_fragmented(spark, path)
    stats = _stats_by_part(path)
    part_bytes = stats[(("part", "a"),)]["bytes"]
    # a target of ~1/3 the partition bytes should produce >1 file
    compact_partitions(
        spark, path, max_files=4, target_file_bytes=max(1, part_bytes // 3)
    )
    stats2 = _stats_by_part(path)
    assert 2 <= stats2[(("part", "a"),)]["n_files"] <= 8
    assert spark.read.parquet(path).where("part = 'a'").count() == 400
