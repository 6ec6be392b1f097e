"""Bloom-filter runtime join pruning (operators/bloom.py).

The load-bearing property is NO FALSE NEGATIVES — the pre-filter must
never drop a fact row that has a match, or the join silently loses
rows. False positives only cost shuffle bytes and are bounded by the
sizing formula; both are checked here, plus end-to-end equivalence of
the pruned join with the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_etl_spark.operators.bloom import (
    bloom_might_contain,
    bloom_prefilter_join,
    build_bloom,
    optimal_bits,
)


def test_optimal_bits_shape():
    assert optimal_bits(0) == 64
    assert optimal_bits(1000) % 64 == 0
    assert optimal_bits(1000, 0.01) > optimal_bits(1000, 0.1)
    assert optimal_bits(100_000) > optimal_bits(1000)


def test_no_false_negatives(spark):
    keys = spark.range(0, 5000).select((F.col("id") * 7 + 3).alias("k"))
    words = build_bloom(keys, "k", num_bits=1 << 14, num_hashes=5)
    hits = keys.where(bloom_might_contain(F.col("k"), words, 5)).count()
    assert hits == 5000  # every inserted key must pass


def test_false_positive_rate_bounded(spark):
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    num_bits = optimal_bits(2000, fpp=0.03)
    words = build_bloom(keys, "k", num_bits=num_bits, num_hashes=5)
    # 20k keys guaranteed NOT in the build set
    non_members = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = non_members.where(bloom_might_contain(F.col("k"), words, 5)).count()
    assert fp / 20_000 < 0.10  # 3% target, 10% hard ceiling


def test_prefilter_join_matches_plain_semi(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    probe = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    got = bloom_prefilter_join(
        orders, probe, "o_custkey", "c_custkey", "semi", num_bits=1 << 14
    )
    want = orders.join(
        probe.select("c_custkey").distinct(),
        orders["o_custkey"] == probe["c_custkey"],
        "left_semi",
    )
    a = sorted(r.o_orderkey for r in got.collect())
    b = sorted(r.o_orderkey for r in want.collect())
    assert a == b


def test_prefilter_join_matches_plain_inner(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    probe = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_name")
    )
    got = bloom_prefilter_join(
        orders, probe, "o_custkey", "c_custkey", "inner", num_bits=1 << 14
    )
    want = orders.join(probe, orders["o_custkey"] == probe["c_custkey"], "inner")
    a = sorted((r.o_orderkey, r.c_name) for r in got.collect())
    b = sorted((r.o_orderkey, r.c_name) for r in want.collect())
    assert a == b


def test_outer_join_rejected(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_prefilter_join(df, df, "k", "k", "left_outer")


def test_null_keys_ignored_in_build(spark):
    keys = spark.range(0, 100).select(
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("k")
    )
    words = build_bloom(keys, "k", num_bits=1 << 12, num_hashes=5)
    evens = spark.range(0, 100, 2).select(F.col("id").alias("k"))
    assert evens.where(bloom_might_contain(F.col("k"), words, 5)).count() == 50


def test_bitmap_size_independent_of_rows(spark):
    big = spark.range(0, 50_000).select(F.col("id").alias("k"))
    words = build_bloom(big, "k", num_bits=1 << 12, num_hashes=3)
    assert len(words) == (1 << 12) // 64


def test_broadcast_path_matches_literal_path(spark, sf_dir):
    from github_etl_spark.operators.bloom import (
        bloom_broadcast_filter,
        build_bloom_df,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    probe = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    num_bits = 1 << 14
    words = build_bloom(probe, "c_custkey", num_bits, 5)
    lit_rows = sorted(
        r.o_orderkey
        for r in orders.where(
            bloom_might_contain(F.col("o_custkey"), words, 5)
        ).collect()
    )
    wdf = build_bloom_df(probe, "c_custkey", num_bits, 5)
    bc_rows = sorted(
        r.o_orderkey
        for r in bloom_broadcast_filter(orders, "o_custkey", wdf, num_bits, 5).collect()
    )
    assert lit_rows == bc_rows


def test_prefilter_join_large_bitmap_uses_broadcast(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    probe = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    # force the broadcast regime with a tiny literal cap
    got = bloom_prefilter_join(
        orders, probe, "o_custkey", "c_custkey", "semi",
        num_bits=1 << 14, max_literal_words=4,
    )
    want = orders.join(
        probe.select("c_custkey").distinct(),
        orders["o_custkey"] == probe["c_custkey"],
        "left_semi",
    )
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in want.collect()
    )
