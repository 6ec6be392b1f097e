"""Differential property tests for bloom-join pruning and heavy
hitters: pure-Python ground truth, hypothesis-generated inputs, one
Spark roundtrip per example (same harness shape as
test_span_bm25_property)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings, strategies as st

from github_etl_spark.operators.bloom import bloom_prefilter_join
from github_etl_spark.operators.sketches import heavy_hitters

keys_strategy = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=40
)


@settings(max_examples=20, deadline=None)
@given(fact_keys=keys_strategy, probe_keys=keys_strategy)
def test_bloom_semi_join_equals_set_intersection(spark, fact_keys, probe_keys):
    fact = spark.createDataFrame(
        [(i, k) for i, k in enumerate(fact_keys)] or [(0, None)], "row_id int, k long"
    )
    probe = spark.createDataFrame(
        [(k,) for k in probe_keys] or [(None,)], "k long"
    )
    got = sorted(
        r.row_id
        for r in bloom_prefilter_join(
            fact, probe, "k", "k", "semi", num_bits=1 << 10
        ).collect()
    )
    probe_set = set(probe_keys)
    want = sorted(i for i, k in enumerate(fact_keys) if k in probe_set)
    assert got == want


# skewed multiset: few distinct values, many repeats → real heavy hitters
items_strategy = st.lists(
    st.integers(min_value=0, max_value=8), min_size=1, max_size=120
)


@settings(max_examples=20, deadline=None)
@given(items=items_strategy, frac=st.sampled_from([0.05, 0.2, 0.5]))
def test_heavy_hitters_equals_exact_counts(spark, items, frac):
    df = spark.createDataFrame([(i,) for i in items], "item long")
    got = {
        (r["tok"], r["term_count"])
        for r in heavy_hitters(df, "item", frac, counters=64).collect()
    }
    threshold = math.ceil(frac * len(items))
    want = {
        (str(k), c) for k, c in Counter(items).items() if c >= threshold
    }
    assert got == want
