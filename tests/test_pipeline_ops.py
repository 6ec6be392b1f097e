"""Training-data pipeline operators (operators/pipeline.py).

Semantics tests on hand-built frames plus fixture-level invariants at
sf0.001; cross-engine parity is enforced by the driver-sim oracle for
the four `plans/pipeline.py` catalog queries.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from github_etl_spark.functions.text import redact_pii_expr
from github_etl_spark.operators.pipeline import (
    hash_split,
    portable_hash_bucket,
    repetition_metrics,
    stratified_sample,
)
from github_etl_spark.tables import load_tables


def _docs(spark):
    return load_tables(spark, "/root/testdata/sf0.001")["documents"]


# ---------------------------------------------------------------- hash split


def test_hash_bucket_matches_python_md5(spark):
    """The portable bucket is reproducible off-cluster with stdlib md5."""
    df = spark.range(50).select(
        F.col("id"), portable_hash_bucket(F.col("id")).alias("bucket")
    )
    for row in df.collect():
        expect = int(hashlib.md5(str(row.id).encode()).hexdigest()[:8], 16) % 100
        assert row.bucket == expect


def test_hash_split_deterministic_and_complete(spark):
    docs = _docs(spark)
    a = hash_split(docs, "doc_id").select("doc_id", "split")
    b = hash_split(docs.repartition(7), "doc_id").select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    n = docs.count()
    by_split = dict(
        a.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    assert sum(by_split.values()) == n
    # 80/10/10 within loose tolerance (hash uniformity, n=500)
    assert 0.7 < by_split["train"] / n < 0.9
    assert 0.04 < by_split["val"] / n < 0.16
    assert 0.04 < by_split["test"] / n < 0.16


def test_hash_split_custom_weights(spark):
    df = hash_split(spark.range(200), "id", weights=(0.5, 0.5), names=("a", "b"))
    got = {r["split"] for r in df.select("split").distinct().collect()}
    assert got == {"a", "b"}
    assert df.filter((F.col("bucket") < 50) & (F.col("split") != "a")).count() == 0


# ------------------------------------------------------------- repetition


def test_repetition_metrics_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),  # bigrams: ab ba ab ba -> top 2/4, dup 4/4
            (2, "x y z w"),  # bigrams all unique -> top 1/3, dup 0
            (3, "solo"),  # < 2 tokens -> absent
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_metrics(df, "text", "doc_id").collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_grams == 4
    assert rows[1].top_gram_frac == 0.5
    assert rows[1].dup_gram_frac == 1.0
    assert rows[2].n_grams == 3
    assert abs(rows[2].top_gram_frac - 0.3333) < 1e-9
    assert rows[2].dup_gram_frac == 0.0


def test_repetition_bounds_on_fixture(spark):
    m = repetition_metrics(_docs(spark), "text", "doc_id")
    bad = m.filter(
        (F.col("top_gram_frac") > 1)
        | (F.col("top_gram_frac") <= 0)
        | (F.col("dup_gram_frac") > 1)
        | (F.col("dup_gram_frac") < 0)
        | (F.col("dup_gram_frac") > 0)
        & (F.col("dup_gram_frac") < F.col("top_gram_frac"))
    )
    assert bad.count() == 0


# ------------------------------------------------------------- stratified


def test_stratified_sample_exact_counts(spark):
    docs = _docs(spark)
    frac = 0.1
    import math

    expect = {
        r["lang"]: math.ceil(r["count"] * frac)
        for r in docs.groupBy("lang").count().collect()
    }
    got = {
        r["lang"]: r["count"]
        for r in stratified_sample(docs, ["lang"], frac, "doc_id")
        .groupBy("lang")
        .count()
        .collect()
    }
    assert got == expect


def test_stratified_sample_stable_under_repartition(spark):
    docs = _docs(spark)
    a = stratified_sample(docs, ["lang"], 0.2, "doc_id").select("doc_id")
    b = stratified_sample(docs.repartition(13), ["lang"], 0.2, "doc_id").select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ------------------------------------------------------------------ PII


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call +1-555-123 4567 today"),
            (3, "both a@b.io and 020 7946 0958 ok"),
            (4, "clean text with no pii at all"),
        ],
        ["i", "t"],
    )
    got = {r.i: r.red for r in df.select("i", redact_pii_expr(F.col("t")).alias("red")).collect()}
    assert got[1] == "mail [EMAIL] now"
    assert got[2] == "call [PHONE] today"
    assert got[3] == "both [EMAIL] and [PHONE] ok"
    assert got[4] == "clean text with no pii at all"
