"""Misra-Gries heavy hitters (operators/sketches.py): exactness vs the
plain GROUP BY, the measured completeness bound, and partitioning
invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_etl_spark.operators.sketches import (
    HeavyHitterBoundError,
    heavy_hitters,
)


def _exact(df, col, frac):
    import math

    n = df.where(F.col(col).isNotNull()).count()
    s = math.ceil(frac * n)
    return {
        (r["tok"], r["cnt"])
        for r in df.groupBy(F.col(col).cast("string").alias("tok"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("tok").isNotNull() & (F.col("cnt") >= s))
        .collect()
    }


def test_matches_exact_groupby_zipf(spark):
    # Zipf-ish: item i appears ~ 5000/i times
    items = spark.range(1, 200).select(
        F.explode(F.sequence(F.lit(1), (F.lit(5000) / F.col("id")).cast("int")))
        .alias("rep"),
        F.col("id").alias("item"),
    ).select("item")
    got = {
        (r["tok"], r["term_count"])
        for r in heavy_hitters(items, "item", 0.02).collect()
    }
    assert got == _exact(items, "item", 0.02)
    assert len(got) > 0


def test_bound_error_when_counters_too_small(spark):
    # near-uniform data + tiny counter budget → bound cannot hold
    items = spark.range(0, 20000).select((F.col("id") % 5000).alias("item"))
    with pytest.raises(HeavyHitterBoundError, match="increase counters"):
        heavy_hitters(items, "item", 0.0004, counters=8)


def test_partitioning_invariance(spark):
    items = spark.range(0, 30000).select(
        (F.pmod(F.xxhash64("id"), F.lit(50)) * F.pmod(F.xxhash64("id"), F.lit(50)))
        .alias("item")
    )
    a = {
        (r["tok"], r["term_count"])
        for r in heavy_hitters(items.repartition(1), "item", 0.01).collect()
    }
    b = {
        (r["tok"], r["term_count"])
        for r in heavy_hitters(items.repartition(16), "item", 0.01).collect()
    }
    assert a == b == _exact(items, "item", 0.01)


def test_nulls_ignored(spark):
    items = spark.range(0, 1000).select(
        F.when(F.col("id") % 3 != 0, F.lit("x")).alias("item")
    )
    got = heavy_hitters(items, "item", 0.5).collect()
    assert {(r["tok"], r["term_count"]) for r in got} == {("x", 666)}


def test_all_same_item(spark):
    items = spark.range(0, 5000).select(F.lit("only").alias("item"))
    got = heavy_hitters(items, "item", 0.9, counters=4).collect()
    assert {(r["tok"], r["term_count"]) for r in got} == {("only", 5000)}


def test_empty_input_returns_empty(spark):
    items = spark.range(0).select(F.col("id").alias("item"))
    got = heavy_hitters(items, "item", 0.01)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["tok", "term_count"]
