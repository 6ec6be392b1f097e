"""Incremental rollup maintenance (sinks/rollup.py): folding disjoint
deltas equals the full recompute, in any delta order; non-distributive
aggregates are rejected."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from github_etl_spark.sinks.rollup import rollup_aggregate, rollup_update
from github_etl_spark.tables import load_tables

KEYS = ["l_returnflag", "l_linestatus"]
MEASURES = {
    "n_rows": ("l_quantity", "count"),
    "sum_qty": ("l_quantity", "sum"),
    "min_price": ("l_extendedprice", "min"),
    "max_price": ("l_extendedprice", "max"),
}


def _deltas(spark):
    li = load_tables(spark, "/root/testdata/sf0.001")["lineitem"]
    return [li.where(F.col("l_orderkey") % 3 == i) for i in range(3)], li


def _as_map(df):
    return {
        tuple(r[k] for k in KEYS): (r.n_rows, r.sum_qty, r.min_price, r.max_price)
        for r in df.collect()
    }


def test_incremental_equals_full_recompute(spark, tmp_path):
    deltas, full = _deltas(spark)
    path = os.path.join(str(tmp_path), "rollup")
    for d in deltas:
        rollup_update(spark, path, d, KEYS, MEASURES)
    got = _as_map(spark.read.parquet(path))
    want = _as_map(rollup_aggregate(full, KEYS, MEASURES))
    assert got == want


def test_delta_order_irrelevant(spark, tmp_path):
    deltas, _full = _deltas(spark)
    a = os.path.join(str(tmp_path), "a")
    b = os.path.join(str(tmp_path), "b")
    for d in deltas:
        rollup_update(spark, a, d, KEYS, MEASURES)
    for d in reversed(deltas):
        rollup_update(spark, b, d, KEYS, MEASURES)
    assert _as_map(spark.read.parquet(a)) == _as_map(spark.read.parquet(b))


def test_non_distributive_rejected(spark):
    deltas, _ = _deltas(spark)
    with pytest.raises(ValueError, match="non-distributive"):
        rollup_aggregate(deltas[0], KEYS, {"d": ("l_quantity", "median")})
