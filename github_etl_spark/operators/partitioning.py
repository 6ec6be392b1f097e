"""Parallelism guards for compute-heavy operators.

A small parquet table arrives as ONE input partition (one file, one
row-group), which is correct for scan-bound queries but serializes
operators whose per-row cost dwarfs their I/O (minhash = shingles ×
num_hashes hash evaluations per row). `ensure_parallelism` widens such
inputs to the cluster's parallelism with one cheap round-robin
shuffle; when the input is already wide (the 100 TB case — thousands
of scan partitions), it is a no-op, so the guard never *adds* a
shuffle at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism iff the plan
    currently has fewer partitions. Never narrows."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
