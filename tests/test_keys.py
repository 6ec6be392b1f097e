"""Contiguous surrogate-key assignment (operators/keys.py)."""

from __future__ import annotations

import pytest

from github_etl_spark.operators.keys import assign_surrogate_keys


def _sks(df, col="k", **kw):
    out = assign_surrogate_keys(df, col, **kw)
    return sorted((r[col], r["sk"]) for r in out.collect())


def test_ids_are_contiguous_in_key_order(spark):
    df = spark.range(0, 100).selectExpr("(id * 7) % 1000 as k").distinct()
    got = _sks(df)
    keys = sorted(r[0] for r in df.collect())
    assert got == [(k, i + 1) for i, k in enumerate(keys)]


def test_start_offset_and_custom_column(spark):
    df = spark.range(0, 5).selectExpr("id as k")
    out = assign_surrogate_keys(df, "k", out_col="dim_id", start=1000)
    assert sorted(r["dim_id"] for r in out.collect()) == list(
        range(1000, 1005)
    )


def test_repartition_invariant(spark):
    df = spark.range(0, 500).selectExpr("id * 3 as k")
    assert _sks(df) == _sks(df.repartition(13))


def test_duplicate_and_null_keys_rejected(spark):
    dup = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    with pytest.raises(ValueError, match="not unique"):
        assign_surrogate_keys(dup, "k")
    nul = spark.createDataFrame([(1,), (None,)], "k long")
    with pytest.raises(ValueError, match="NULL"):
        assign_surrogate_keys(nul, "k")
    # check can be waived when enforced upstream
    out = assign_surrogate_keys(dup.distinct(), "k", check_unique=False)
    assert out.count() == 2


def test_existing_output_column_rejected(spark):
    df = spark.range(3).selectExpr("id as k", "id as sk")
    with pytest.raises(ValueError, match="already exists"):
        assign_surrogate_keys(df, "k")


def test_empty_input(spark):
    df = spark.createDataFrame([], "k long")
    assert assign_surrogate_keys(df, "k").count() == 0


def test_string_keys_and_extra_columns_survive(spark):
    df = spark.createDataFrame(
        [("b", 10), ("a", 20), ("c", 30)], "k string, v int"
    )
    rows = {r["k"]: r.asDict()
            for r in assign_surrogate_keys(df, "k").collect()}
    assert [rows[k]["sk"] for k in ("a", "b", "c")] == [1, 2, 3]
    assert rows["a"]["v"] == 20
