"""Self-test of the oracle harness: the comparison must FAIL on
injected divergence — a vacuous-green harness would silently bless
every query, so its sensitivity is itself pinned by tests."""

from __future__ import annotations

import pytest

from .oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_conn(sf_dir)


def _probe(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .select("r_regionkey", "r_name")
    )


GOOD_SQL = "SELECT r_regionkey, r_name FROM region"


def test_detects_green(spark, sf_dir, con):
    compare(_probe(spark, sf_dir), con, GOOD_SQL)


def test_detects_value_mismatch(spark, sf_dir, con):
    with pytest.raises(AssertionError):
        compare(
            _probe(spark, sf_dir),
            con,
            "SELECT r_regionkey + 1 AS r_regionkey, r_name FROM region",
        )


def test_detects_row_count_mismatch(spark, sf_dir, con):
    with pytest.raises(AssertionError):
        compare(_probe(spark, sf_dir), con, GOOD_SQL + " WHERE r_regionkey > 0")


def test_detects_column_rename(spark, sf_dir, con):
    with pytest.raises(AssertionError):
        compare(
            _probe(spark, sf_dir),
            con,
            "SELECT r_regionkey, r_name AS region_name FROM region",
        )


def test_detects_duplicate_multiset_difference(spark, sf_dir, con):
    # same distinct values, different multiplicities — the multiset
    # comparison must catch it (a set-based compare would not)
    df = _probe(spark, sf_dir).limit(1)
    dup = df.union(df)
    with pytest.raises(AssertionError):
        compare(
            dup,
            con,
            "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 1",
        )
