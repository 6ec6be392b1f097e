"""Quarantining JSON parser (functions/jsonutil.py): conforming rows
parse, malformed rows are captured — never crashed on, never silently
dropped."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_etl_spark.functions.jsonutil import (
    json_conformance_rate,
    parse_json_quarantine,
)

ROWS = [
    (1, '{"k": 10, "tag": "a"}'),
    (2, '{"k": 20}'),                 # missing key -> NULL field, conforms
    (3, '{"k": "not-an-int"}'),       # type mismatch -> quarantined
    (4, "{broken json"),              # syntax error -> quarantined
    (5, None),                        # absent payload conforms vacuously
]
SCHEMA = "k int, tag string"


def _fixture(spark):
    return spark.createDataFrame(ROWS, "id int, props string")


def test_split_parsed_vs_quarantined(spark):
    ok, bad = parse_json_quarantine(_fixture(spark), "props", SCHEMA)
    assert sorted(r.id for r in ok.collect()) == [1, 2, 5]
    assert sorted(r.id for r in bad.collect()) == [3, 4]


def test_parsed_fields_and_null_payload(spark):
    ok, _ = parse_json_quarantine(_fixture(spark), "props", SCHEMA)
    by_id = {r.id: r for r in ok.collect()}
    assert by_id[1].k == 10 and by_id[1].tag == "a"
    assert by_id[2].k == 20 and by_id[2].tag is None
    assert by_id[5].k is None and by_id[5].tag is None


def test_quarantine_preserves_raw_payload(spark):
    _, bad = parse_json_quarantine(_fixture(spark), "props", SCHEMA)
    raw = {r.id: r["_corrupt_record"] for r in bad.collect()}
    assert raw[4] == "{broken json"
    assert "not-an-int" in raw[3]


def test_no_rows_lost(spark):
    df = _fixture(spark)
    ok, bad = parse_json_quarantine(df, "props", SCHEMA)
    assert ok.count() + bad.count() == df.count()


def test_conformance_rate(spark):
    df = _fixture(spark)
    row = df.agg(json_conformance_rate(df, "props", SCHEMA)).head()
    # 2 of 4 non-NULL payloads parse
    assert abs(row["json_conformance_rate"] - 0.5) < 1e-9


def test_fixture_props_all_conform(spark, sf_dir):
    events = __import__("github_etl_spark.tables", fromlist=["load_tables"]).load_tables(
        spark, sf_dir
    )["events"]
    ok, bad = parse_json_quarantine(events, "props", "k int")
    assert bad.count() == 0
    assert ok.where(F.col("k").isNotNull()).count() > 0


def test_schema_field_colliding_with_input_column_rejected(spark):
    import pytest

    df = _fixture(spark)
    with pytest.raises(ValueError, match="collide with input columns"):
        parse_json_quarantine(df, "props", "props string, k int")


def test_reserved_corrupt_record_field_rejected(spark):
    import pytest

    df = _fixture(spark)
    with pytest.raises(ValueError, match="_corrupt_record"):
        parse_json_quarantine(df, "props", "k int, _corrupt_record string")


def test_schema_collision_detected_case_insensitively(spark):
    """Spark resolves names case-insensitively by default, so 'PROPS'
    collides with input column 'props' even though the strings differ."""
    import pytest

    df = _fixture(spark)
    with pytest.raises(ValueError, match="collide with input columns"):
        parse_json_quarantine(df, "props", "PROPS string, k int")
