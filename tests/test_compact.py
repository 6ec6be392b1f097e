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


def test_compaction_after_streaming_gate_ingest(spark, tmp_path):
    """Ops composition: the streaming dedup gate lands one partition
    per batch (many small files over time); compaction then rewrites
    the fragmented table while preserving every admitted row and the
    per-batch partition values — the maintenance pass a long-lived
    ingest table needs."""
    from github_etl_spark.operators.incremental import dedup_index_build
    from github_etl_spark.streaming.dedup_gate import make_dedup_gate

    corpus = spark.createDataFrame(
        [(i, f"seed document number {i} with unique words w{i} x{i}") for i in range(20)],
        "doc_id long, text string",
    )
    index = str(tmp_path / "index")
    dedup_index_build(corpus, index)
    out = str(tmp_path / "admitted")
    gate = make_dedup_gate(spark, index, out)
    for b in range(6):  # 6 micro-batches → 6 partitions of tiny files
        batch = spark.createDataFrame(
            [
                (1000 + b * 10 + i, f"novel text {b}-{i} about topic t{b} item i{i}")
                for i in range(5)
            ],
            "doc_id long, text string",
        ).repartition(4)  # force several files per batch partition
        gate(batch, b)

    rows_before = sorted(map(tuple, spark.read.parquet(out).collect()))
    stats_before = partition_stats(out)
    assert sum(p["n_files"] for p in stats_before) > len(stats_before)

    rewritten = compact_partitions(spark, out, max_files=1)
    assert rewritten  # something was fragmented
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == rows_before
    stats_after = {tuple(sorted(p["partition"].items())): p for p in partition_stats(out)}
    for p in rewritten:
        assert stats_after[tuple(sorted(p["partition"].items()))]["n_files"] == 1
