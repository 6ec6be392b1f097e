"""Data-quality constraint verification (operators/dq.py).

Unit behavior on hand-crafted dirty frames — nulls, duplicate keys,
orphaned foreign keys, predicate violations; the catalog query's
cross-engine exactness is covered by the DuckDB oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_etl_spark.operators.dq import (
    Compliance,
    constraint_report,
    key_metrics,
    referential_violations,
    row_metrics,
)


def _report(df):
    return {r["constraint_name"]: r.asDict() for r in df.collect()}


def test_row_metrics_counts_nulls_and_predicate_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (None, -5.0), (4, 0.0)],
        "k int, v double",
    )
    row = row_metrics(
        df,
        completeness=["k", "v"],
        compliance=[Compliance("v_pos", F.col("v") > 0)],
    ).first()
    assert row["total"] == 4
    assert row["v_completeness_k"] == 1
    assert row["v_completeness_v"] == 1
    # violations: v=None (NULL predicate), v=-5, v=0 -> 3
    assert row["v_v_pos"] == 3


def test_key_metrics_uniqueness_vs_distinctness(spark):
    # keys: a a a b c  -> uniqueness violations = 3 (the a-rows),
    # distinctness violations = rows - distinct = 5 - 3 = 2
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("c",)], "k string"
    )
    row = key_metrics(df, "k").first()
    assert row["v_uniqueness_k"] == 3
    assert row["v_distinctness_k"] == 2


def test_referential_violations_ignore_null_keys(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (99,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = referential_violations(child, "fk", parent, "pk").first()
    # the three 99-rows are orphans; the NULL row is not an RI violation
    assert row["v_ref_fk"] == 3


def test_referential_violations_zero_when_clean(spark):
    child = spark.createDataFrame([(1,), (2,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    assert referential_violations(child, "fk", parent, "pk").first()[
        "v_ref_fk"
    ] == 0


def test_constraint_report_rounding_threshold_and_verdict(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "k int, v double"
    )
    metrics = row_metrics(
        df,
        completeness=["k"],
        compliance=[Compliance("v_small", F.col("v") <= 7)],
    )
    rep = _report(
        constraint_report(
            metrics, [("completeness_k", 1.0), ("v_small", 0.7)]
        )
    )
    assert rep["completeness_k"]["metric"] == 1.0
    assert rep["completeness_k"]["passed"] is True
    # 3 violations of 10 -> metric 0.7, passes AT the threshold
    assert rep["v_small"]["metric"] == 0.7
    assert rep["v_small"]["n_violations"] == 3
    assert rep["v_small"]["passed"] is True
    rep2 = _report(constraint_report(metrics, [("v_small", 0.700001)]))
    assert rep2["v_small"]["passed"] is False


def test_constraint_report_empty_table_is_all_pass(spark):
    df = spark.createDataFrame([], "k int, v double")
    metrics = row_metrics(
        df, completeness=["k"], compliance=[Compliance("v_pos", F.col("v") > 0)]
    )
    rep = _report(
        constraint_report(metrics, [("completeness_k", 1.0), ("v_pos", 1.0)])
    )
    # zero rows -> zero violations -> vacuously green (greatest(total,1)
    # guards the division)
    assert all(r["passed"] for r in rep.values())
    assert all(r["n_violations"] == 0 for r in rep.values())


def test_drift_report_flags_only_moved_metrics(spark):
    from github_etl_spark.operators.dq import drift_report

    base = spark.createDataFrame([(100.0, 0.5)], "m1 double, m2 double")
    curr = spark.createDataFrame([(100.0, 0.6)], "m1 double, m2 double")
    rep = {r["metric_name"]: r.asDict()
           for r in drift_report(base, curr, ["m1", "m2"]).collect()}
    assert rep["m1"]["rel_delta"] == 0.0 and rep["m1"]["drifted"] is False
    # |0.6-0.5| / max(|0.5|, 1.0) — the denominator floors at 1
    assert rep["m2"]["rel_delta"] == 0.1 and rep["m2"]["drifted"] is True
    assert rep["m2"]["base_value"] == 0.5


def test_drift_report_small_base_uses_absolute_floor(spark):
    from github_etl_spark.operators.dq import drift_report

    # |base| < 1 -> denominator floors at 1.0, so near-zero baselines
    # don't turn noise into infinite relative drift
    base = spark.createDataFrame([(0.001,)], "m double")
    curr = spark.createDataFrame([(0.003,)], "m double")
    row = drift_report(base, curr, ["m"]).first()
    assert row["rel_delta"] == 0.002
    assert row["drifted"] is False


def test_drift_report_threshold_is_strict(spark):
    from github_etl_spark.operators.dq import drift_report

    base = spark.createDataFrame([(100.0,)], "m double")
    curr = spark.createDataFrame([(105.0,)], "m double")
    assert drift_report(base, curr, ["m"], threshold=0.05).first()[
        "drifted"
    ] is False
    assert drift_report(base, curr, ["m"], threshold=0.049).first()[
        "drifted"
    ] is True


def test_empty_constraint_and_metric_lists_rejected(spark):
    import pytest

    from github_etl_spark.operators.dq import (
        constraint_report,
        drift_report,
        row_metrics,
    )

    df = spark.createDataFrame([(1,)], "k int")
    metrics = row_metrics(df, completeness=["k"], compliance=[])
    with pytest.raises(ValueError, match="at least one constraint"):
        constraint_report(metrics, [])
    with pytest.raises(ValueError, match="at least one metric"):
        drift_report(metrics, metrics, [])
