

# ---------------------------------------------------------------- band join


def test_band_join_exact_boundaries_and_uniqueness(spark):
    from github_etl_spark.operators.asof import band_join

    a = spark.createDataFrame([(1, 100), (2, 200)], "ka long, va long")
    b = spark.createDataFrame(
        [(10, 90), (11, 110), (12, 150), (13, 151), (14, 49)],
        "kb long, vb long",
    )
    got = sorted(
        (r["ka"], r["kb"])
        for r in band_join(a, b, "va", "vb", 50).collect()
    )
    # 100: matches 90, 110, 150 (|diff|=50 INCLUSIVE), not 151/49
    # 200: matches 150, 151; each pair appears EXACTLY once
    assert got == [(1, 10), (1, 11), (1, 12), (2, 12), (2, 13)]


def test_band_join_negative_values(spark):
    from github_etl_spark.operators.asof import band_join

    a = spark.createDataFrame([(1, -100)], "ka long, va long")
    b = spark.createDataFrame(
        [(10, -130), (11, -40), (12, -151)], "kb long, vb long"
    )
    got = sorted(r["kb"] for r in band_join(a, b, "va", "vb", 50).collect())
    assert got == [10]


def test_band_join_rejects_non_integral_and_bad_delta(spark):
    import pytest

    from github_etl_spark.operators.asof import band_join

    a = spark.createDataFrame([(1, 1.0)], "ka long, va double")
    b = spark.createDataFrame([(2, 2)], "kb long, vb long")
    with pytest.raises(TypeError, match="integral"):
        band_join(a, b, "va", "vb", 10)
    c = spark.createDataFrame([(1, 1)], "ka long, va long")
    with pytest.raises(ValueError, match="positive"):
        band_join(c, b, "va", "vb", 0)


def test_band_join_plans_no_cartesian(spark):
    import re

    from github_etl_spark.operators.asof import band_join

    a = spark.createDataFrame([(i, i * 7) for i in range(50)], "ka long, va long")
    b = spark.createDataFrame([(i, i * 11) for i in range(50)], "kb long, vb long")
    plan = band_join(a, b, "va", "vb", 25)._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"CartesianProduct|BroadcastNestedLoop", plan), plan


def test_band_join_shared_column_name(spark):
    # Both sides carry the SAME value-column name: the band predicate
    # must bind through the frame references, not a bare F.col().
    from github_etl_spark.operators.asof import band_join

    a = spark.createDataFrame([(1, 100), (2, 200)], "ka long, cents long")
    b = spark.createDataFrame([(10, 120), (11, 260)], "kb long, cents long")
    got = sorted(
        (r["ka"], r["kb"])
        for r in band_join(a, b, "cents", "cents", 50)
        .select("ka", "kb")
        .collect()
    )
    assert got == [(1, 10)]


def test_band_join_rejects_preexisting_bucket_column(spark):
    import pytest

    from github_etl_spark.operators.asof import band_join

    a = spark.createDataFrame([(1, 1, 9)], "ka long, va long, __band_bucket long")
    b = spark.createDataFrame([(2, 2)], "kb long, vb long")
    with pytest.raises(ValueError, match="__band_bucket"):
        band_join(a, b, "va", "vb", 10)
    # …and casefolded (Spark resolves names case-insensitively)
    c = spark.createDataFrame([(1, 1, 9)], "ka long, va long, __BAND_BUCKET long")
    with pytest.raises(ValueError, match="__band_bucket"):
        band_join(c, b, "va", "vb", 10)
