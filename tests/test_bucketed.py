"""Bucketed co-located joins: the no-shuffle join plan, asserted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_etl_spark.sinks.bucketed import colocated_join, write_bucketed
from github_etl_spark.tables import load_tables


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    t = load_tables(spark, sf_dir, register=False)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(
        t["orders"].select("o_orderkey", "o_custkey", "o_orderstatus"),
        "b_orders",
        "o_orderkey",
        buckets=8,
    )
    write_bucketed(
        t["lineitem"]
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_linenumber"),
        "b_lineitem",
        "o_orderkey",
        buckets=8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, left, right, "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # the whole point of bucketing
    assert joined.count() > 0


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    t = load_tables(spark, sf_dir, register=False)
    expected = (
        t["orders"]
        .join(
            t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        .count()
    )
    assert colocated_join(spark, left, right, "o_orderkey").count() == expected


def test_unbucketed_baseline_does_shuffle(spark, sf_dir):
    """Sanity: the same join WITHOUT bucketing plans an Exchange —
    proving the bucketed plan's absence of one is the layout's doing."""
    t = load_tables(spark, sf_dir, register=False)
    joined = t["orders"].join(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey").hint("merge"),
        "o_orderkey",
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
