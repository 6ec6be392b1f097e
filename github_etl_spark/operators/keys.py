"""Contiguous surrogate-key assignment (EXT — warehouse plumbing).

Spark has no scalable "number these rows 1..N" primitive:
``monotonically_increasing_id`` is non-contiguous (partition-id in the
high bits), ``zipWithIndex`` detours through an RDD and loses the
DataFrame lineage, and ``row_number() OVER (ORDER BY ...)`` with no
PARTITION BY collapses the whole table into ONE window task — the
single-machine bottleneck that kills dimension-key assignment at
100 TB.

``assign_surrogate_keys`` is the standard two-pass distributed form:

1. range-partition + sort within partitions by the (unique) order key
   — a fully parallel distributed sort; range partition i holds keys
   smaller than partition i+1's, so partition ids are globally
   ordered;
2. one tiny aggregate collects PER-PARTITION row counts (bounded by
   the partition count, not the data) and turns them into prefix-sum
   offsets;
3. a map-only Arrow pass adds offset + local position.

The result equals ``row_number() OVER (ORDER BY key)`` — the DuckDB
oracle — while every stage stays parallel and the only driver-side
data is one row per partition.

Determinism requires the order key to be UNIQUE: a duplicated key can
land on either side of a range boundary and swap ids between runs, so
the default ``check_unique=True`` spends one aggregate to fail loudly
instead (disable only when uniqueness is already enforced upstream,
e.g. by a dq_constraint_report gate).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_surrogate_keys(
    df: DataFrame,
    order_col: str,
    out_col: str = "sk",
    start: int = 1,
    check_unique: bool = True,
) -> DataFrame:
    """Add ``out_col`` = contiguous 64-bit ids ``start..start+N-1`` in
    ``order_col`` order. See module docstring for the plan shape."""
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    if check_unique:
        row = df.agg(
            F.count(order_col).alias("n"),
            F.count_distinct(order_col).alias("d"),
            (F.count(F.lit(1)) - F.count(order_col)).alias("nulls"),
        ).first()
        if row["nulls"]:
            raise ValueError(
                f"order column {order_col!r} has {row['nulls']} NULLs — "
                "surrogate order would be undefined"
            )
        if row["n"] != row["d"]:
            raise ValueError(
                f"order column {order_col!r} is not unique "
                f"({row['n']} rows, {row['d']} distinct) — duplicate keys "
                "can swap ids across range boundaries between runs"
            )

    # Materialize the range-partitioned sort ONCE (eager checkpoint):
    # the counts pass and the numbering pass must see the SAME
    # partition boundaries — RangePartitioning samples to pick
    # boundaries, and two independent computations may pick different
    # ones, which would misalign the prefix-sum offsets (wrong ids,
    # not merely unstable ones). Reliable checkpoint when a dir is
    # configured, executor-local blocks otherwise.
    parts = df.repartitionByRange(F.col(order_col)).sortWithinPartitions(
        order_col
    )
    from ..session import eager_checkpoint

    parts = eager_checkpoint(parts)
    # Pass 1: per-partition counts -> prefix-sum offsets. One row per
    # partition crosses to the driver, nothing else.
    counts = (
        parts.select(F.spark_partition_id().alias("__pid"))
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_pid = {r["__pid"]: r["c"] for r in counts}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    # A FRESH StructType: StructType.add mutates in place, and the
    # input frame's own schema object must not grow the output column.
    schema = StructType(
        list(parts.schema.fields) + [StructField(out_col, LongType())]
    )
    names = [f.name for f in schema.fields]

    def number(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Arrow batches arrive in partition order (narrow pass); the
        # partition id is read from the TaskContext, the offset from
        # the closure-captured prefix sums.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pos = offsets.get(pid, start)
        for pdf in it:
            n = len(pdf)
            pdf = pdf.copy()
            pdf[out_col] = range(pos, pos + n)
            pos += n
            yield pdf[names]

    return parts.mapInPandas(number, schema)
