"""basket_association_rules must drop over-cap baskets BEFORE the
in-row O(B²) pair expansion: one skewed mega-order (a basket holding
everything) would otherwise build a quadratic array in a single row —
the exact hazard cooccurrence_edges(max_group_size) and the minhash
bucket cap already guard against (VERDICT r9, What's wrong #1)."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed_basket_dir(tmp_path_factory):
    """Fixture mirror whose lineitem is 3 tiny identical baskets plus
    ONE mega-basket with 101 distinct parts (over MAX_BASKET_SIZE),
    using partkeys disjoint from the tiny baskets'."""
    dst = str(tmp_path_factory.mktemp("sf_skewed_basket"))
    for fn in os.listdir(SRC):
        if fn.endswith(".parquet") and fn != "lineitem.parquet":
            shutil.copy(os.path.join(SRC, fn), dst)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT spec.l_orderkey, spec.l_partkey,
                 t.* EXCLUDE (l_orderkey, l_partkey)
          FROM (SELECT * FROM read_parquet('{SRC}/lineitem.parquet')
                LIMIT 1) t
          CROSS JOIN (
            SELECT CAST(b AS BIGINT) AS l_orderkey,
                   CAST(p AS BIGINT) AS l_partkey
            FROM range(1, 4) r1(b), range(1, 3) r2(p)
            UNION ALL
            SELECT 99, 100000 + x FROM range(0, 101) r3(x)
          ) spec
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return dst


def test_mega_basket_is_dropped_everywhere(spark, skewed_basket_dir):
    from github_etl_spark.plans.ext import basket_association_rules

    rows = basket_association_rules(spark, skewed_basket_dir).collect()
    # The only surviving rule is (1,2) across the 3 tiny baskets; the
    # mega-basket contributes NO pairs and is excluded from n_baskets
    # (support = 3/3, not 3/4 — the cap applies to the whole analysis).
    assert [(r["pa"], r["pb"], r["c_ab"]) for r in rows] == [(1, 2, 3)]
    assert rows[0]["support"] == 1.0
