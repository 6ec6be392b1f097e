"""Shuffled-shard writer (operators/shards.py): canonical-permutation
determinism and layout. Assignment/order VALUES are oracle-checked by
the driver (`shards_manifest`)."""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from github_etl_spark.operators.shards import (
    read_canonical_order,
    write_shuffled_shards,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body "), F.col("id")).alias("text"),
    )


def _expected_order(n, n_shards):
    rows = []
    for i in range(n):
        h = hashlib.md5(str(i).encode()).hexdigest()
        rows.append((int(h[:8], 16) % n_shards, h, i))
    return [i for _, _, i in sorted(rows)]


def test_canonical_order_matches_python_replay(spark, tmp_path):
    path = str(tmp_path / "shards")
    write_shuffled_shards(_docs(spark), path, n_shards=4)
    got = [r.doc_id for r in read_canonical_order(spark, path).collect()]
    assert got == _expected_order(200, 4)


def test_layout_is_partitioning_invariant(spark, tmp_path):
    """Same corpus, different input partitioning → byte-identical
    shard membership and order (the reproducibility contract)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_shuffled_shards(_docs(spark), a, n_shards=4)
    write_shuffled_shards(_docs(spark).repartition(13), b, n_shards=4)
    ra = [(r.doc_id, r.shard) for r in read_canonical_order(spark, a).collect()]
    rb = [(r.doc_id, r.shard) for r in read_canonical_order(spark, b).collect()]
    assert ra == rb


def test_every_shard_dir_exists_and_covers_input(spark, tmp_path):
    path = str(tmp_path / "shards")
    write_shuffled_shards(_docs(spark), path, n_shards=4)
    dirs = {os.path.basename(p) for p in glob.glob(f"{path}/shard=*")}
    assert dirs == {f"shard={k}" for k in range(4)}
    total = spark.read.parquet(path).count()
    assert total == 200
    assert spark.read.parquet(path).select("doc_id").distinct().count() == 200


def test_files_are_internally_sorted(spark, tmp_path):
    """Each parquet file's physical row order is the shuffle-key order,
    so a sequential reader streams canonical order with no sort."""
    path = str(tmp_path / "shards")
    write_shuffled_shards(_docs(spark), path, n_shards=4)
    for f in glob.glob(f"{path}/shard=*/*.parquet"):
        keys = pq.read_table(f, columns=["_shuffle_key"]).column(0).to_pylist()
        assert keys == sorted(keys), f
