"""Incrementally-maintained rollup (materialized aggregate) tables
(EXT — incremental view maintenance on the snapshot layout).

A 100 TB fact table cannot be rescanned to refresh a dashboard
aggregate after every ingest. For distributive aggregates
(count / sum / min / max — and avg derived as sum/count) the rollup
over `old ∪ delta` equals the MERGE of the rollup over `old` with the
rollup over `delta`, so maintenance cost is O(delta + rollup), never
O(fact table). That merge-combine identity is exactly Spark's own
partial-aggregation contract (map-side combine merges the same way);
this module applies it across INGESTS instead of across tasks.

Contract: each delta must be disjoint from rows already folded in
(the snapshot sink's dynamic-partition-overwrite idempotence provides
exactly that unit — one `(repo, date)` partition = one delta).
Holistic aggregates (exact distinct counts, medians) do NOT merge
this way; for those keep the sketch family whose states are mergeable
by design: HLL (`a4_hll_sketch`, hll_union_agg) for distincts,
Misra-Gries summaries (operators/sketches.mg_summarize / mg_merge)
for per-ingest heavy-hitter maintenance with certified bounds.

The rollup table itself is rollup-sized (group-key cardinality), so
the rewrite-on-update is cheap; crash-safety between read and rewrite
can be layered with sinks/txnlog if needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# measure merge rules: how two partial states combine.
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts ADD across deltas
    "min": F.min,
    "max": F.max,
}


def _agg_exprs(measures: dict[str, tuple[str, str]], first_pass: bool):
    """measures: out_col -> (input_col, kind). First pass aggregates
    raw rows; merge passes combine partial states (count → sum)."""
    exprs = []
    for out, (col, kind) in measures.items():
        if kind not in _MERGE:
            raise ValueError(f"non-distributive aggregate: {kind!r}")
        if first_pass:
            fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[kind]
        else:
            fn = _MERGE[kind]
        exprs.append(fn(F.col(col if first_pass else out)).alias(out))
    return exprs


def rollup_aggregate(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """One delta's rollup: groupBy keys, first-pass aggregates."""
    return df.groupBy(*keys).agg(*_agg_exprs(measures, first_pass=True))


def rollup_update(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> None:
    """Fold one disjoint delta into the maintained rollup at ``path``.

    Reads the current rollup (absent → empty), unions the delta's
    rollup, merge-combines per key, rewrites. The fact table is never
    read — the delta is the only raw input.
    """
    delta_agg = rollup_aggregate(delta, keys, measures)
    if os.path.isdir(path) and any(
        f.endswith(".parquet")
        for _r, _d, fs in os.walk(path)
        for f in fs
    ):
        current = spark.read.parquet(path)
        merged = (
            current.unionByName(delta_agg)
            .groupBy(*keys)
            .agg(*_agg_exprs(measures, first_pass=False))
        )
    else:
        merged = delta_agg
    # The rollup is group-cardinality-sized: collect-free, one shuffle,
    # rewrite via a staging dir so a crashed update never truncates
    # the previous rollup (rename is atomic per POSIX dir move).
    tmp = path.rstrip("/") + "._staged"
    merged.write.mode("overwrite").parquet(tmp)
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
