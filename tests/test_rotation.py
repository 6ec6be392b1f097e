"""Driver-window rotation: the registry order decides which queries the
driver's fixed-size correctness window re-verifies each round, so the
ordering logic is itself correctness-critical (a query that breaks
while parked outside the window holds a stale green — the round-3
failure mode)."""

from __future__ import annotations

import github_etl_spark.plans as plans
from github_etl_spark.plans import QUERIES, oracle_sqls, spark_queries


def test_order_is_least_recently_checked_first(monkeypatch):
    names = list(QUERIES)
    # Synthetic history: a/b checked round 2 (b red), c round 1, d never.
    a, b, c, d = names[0], names[1], names[2], names[3]
    monkeypatch.setattr(
        plans,
        "_check_history",
        lambda: (
            {a: 2, b: 2, c: 1, **{n: 3 for n in names[4:]}},
            {a: True, b: False, c: True, **{n: True for n in names[4:]}},
        ),
    )
    ordered = list(plans._ordered())
    # Never-checked leads, then ANY red last check (a known failure
    # must re-enter the very next window, not wait out a full rotation
    # cycle — r06's tokenize_encode lesson), then oldest green.
    assert ordered[0] == d
    assert ordered[1] == b
    assert ordered[2] == c
    assert ordered[3] == a
    assert set(ordered) == set(names)


def test_order_covers_every_query_and_oracle_keys_match():
    qs = spark_queries()
    assert set(qs) == set(QUERIES)
    assert set(oracle_sqls()) <= set(qs)


def test_fresh_checkout_degrades_to_registration_order(monkeypatch):
    monkeypatch.setattr(plans, "_check_history", lambda: ({}, {}))
    # registration order, modulo the sibling-adjacency pull-forward
    # (a rows-only query always carries its oracle-checked sibling
    # immediately after it, whatever the history says)
    pair_of = {}
    for n, q in QUERIES.items():
        if q.sibling is not None and q.sibling in QUERIES:
            pair_of[n] = (n, q.sibling)
            pair_of[q.sibling] = (n, q.sibling)
    expect, seen = [], set()
    for n in QUERIES:
        for m in pair_of.get(n, (n,)):
            if m not in seen:
                expect.append(m)
                seen.add(m)
    assert list(plans._ordered()) == expect


def test_sibling_rides_adjacent_in_rotation():
    """Every declared rows-only sibling pair is ADJACENT in rotation
    order (so a driver window can never show one without the other),
    every sibling name resolves, and every sibling is oracle-checked."""
    order = list(plans._ordered())
    pos = {n: i for i, n in enumerate(order)}
    pairs = [(n, q.sibling) for n, q in QUERIES.items() if q.sibling]
    assert pairs, "expected declared siblings for the rows-only set"
    for n, sib in pairs:
        assert sib in QUERIES, f"{n} names unknown sibling {sib}"
        assert QUERIES[sib].oracle is not None, f"sibling {sib} has no oracle"
        assert pos[sib] == pos[n] + 1, f"{sib} not adjacent to {n}"


def test_duplicate_sibling_claim_raises(monkeypatch):
    """Two queries declaring the SAME sibling would silently steal
    adjacency from each other in _ordered; the registry build must
    refuse instead."""
    import pytest

    from github_etl_spark.plans.registry import Query

    fake = dict(QUERIES)
    fn = next(iter(QUERIES.values())).fn
    sib = next(n for n, q in QUERIES.items() if q.oracle is not None)
    fake["_dup_a"] = Query(fn=fn, sibling=sib)
    fake["_dup_b"] = Query(fn=fn, sibling=sib)
    monkeypatch.setattr(plans, "QUERIES", fake)
    monkeypatch.setattr(plans, "_check_history", lambda: ({}, {}))
    with pytest.raises(ValueError, match="sibling conflict"):
        plans._ordered()
