"""Data-quality constraint report (EXT — Deequ-style verification).

One catalog query exercising every constraint kind in operators/dq.py
over the orders/customer pair, with an exact DuckDB oracle: all
metrics are integer-counting under the hood (violation counts are
BIGINT; the fraction is one correctly-rounded IEEE division + the
shared floor-rounding), so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dq import (
    Compliance,
    constraint_report,
    key_metrics,
    referential_violations,
    row_metrics,
)
from ..tables import load_tables
from .registry import query

# (name, threshold) in report order; names match the v_<name> columns
# the metric builders emit.
_CONSTRAINTS = [
    ("completeness_o_custkey", 1.0),
    ("completeness_o_orderdate", 1.0),
    ("uniqueness_o_orderkey", 1.0),
    ("uniqueness_o_custkey", 0.5),
    ("distinctness_o_custkey", 0.5),
    ("positive_totalprice", 1.0),
    ("price_under_cap", 0.7),
    ("status_domain", 1.0),
    ("ref_o_custkey", 1.0),
]


@query(
    "dq_constraint_report",
    headline=True,
    oracle="""
    WITH rowm AS (
      SELECT CAST(count(*) AS BIGINT) AS total,
             CAST(count(*) - count(o_custkey) AS BIGINT)
               AS v_completeness_o_custkey,
             CAST(count(*) - count(o_orderdate) AS BIGINT)
               AS v_completeness_o_orderdate,
             CAST(count(*) - sum(CASE WHEN o_totalprice > 0
                                      THEN 1 ELSE 0 END) AS BIGINT)
               AS v_positive_totalprice,
             CAST(count(*) - sum(CASE WHEN o_totalprice <= 300000
                                      THEN 1 ELSE 0 END) AS BIGINT)
               AS v_price_under_cap,
             CAST(count(*) - sum(CASE WHEN o_orderstatus IN ('O','F','P')
                                      THEN 1 ELSE 0 END) AS BIGINT)
               AS v_status_domain
      FROM orders
    ),
    okey AS (
      SELECT CAST(sum(c) - sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_uniqueness_o_orderkey
      FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
    ),
    ckey AS (
      SELECT CAST(sum(c) - sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_uniqueness_o_custkey,
             CAST(sum(c) - count(*) AS BIGINT) AS v_distinctness_o_custkey
      FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey)
    ),
    rim AS (
      SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS v_ref_o_custkey
      FROM (SELECT o_custkey, count(*) AS c FROM orders
            WHERE o_custkey IS NOT NULL GROUP BY o_custkey) k
      WHERE NOT EXISTS (SELECT 1 FROM customer p
                        WHERE p.c_custkey = k.o_custkey)
    ),
    m AS (SELECT * FROM rowm, okey, ckey, rim),
    rep AS (
      SELECT 'completeness_o_custkey' AS constraint_name,
             v_completeness_o_custkey AS n_violations,
             CAST(1.0 AS DOUBLE) AS threshold, total FROM m
      UNION ALL SELECT 'completeness_o_orderdate',
             v_completeness_o_orderdate, CAST(1.0 AS DOUBLE), total FROM m
      UNION ALL SELECT 'uniqueness_o_orderkey',
             v_uniqueness_o_orderkey, CAST(1.0 AS DOUBLE), total FROM m
      UNION ALL SELECT 'uniqueness_o_custkey',
             v_uniqueness_o_custkey, CAST(0.5 AS DOUBLE), total FROM m
      UNION ALL SELECT 'distinctness_o_custkey',
             v_distinctness_o_custkey, CAST(0.5 AS DOUBLE), total FROM m
      UNION ALL SELECT 'positive_totalprice',
             v_positive_totalprice, CAST(1.0 AS DOUBLE), total FROM m
      UNION ALL SELECT 'price_under_cap',
             v_price_under_cap, CAST(0.7 AS DOUBLE), total FROM m
      UNION ALL SELECT 'status_domain',
             v_status_domain, CAST(1.0 AS DOUBLE), total FROM m
      UNION ALL SELECT 'ref_o_custkey',
             v_ref_o_custkey, CAST(1.0 AS DOUBLE), total FROM m
    )
    SELECT constraint_name,
           (floor((1.0 - CAST(n_violations AS DOUBLE) / greatest(total, 1))
                  * 1000000 + 0.5) / 1000000) AS metric,
           threshold,
           n_violations,
           ((floor((1.0 - CAST(n_violations AS DOUBLE) / greatest(total, 1))
                   * 1000000 + 0.5) / 1000000) >= threshold) AS passed
    FROM rep
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: Deequ-style data-quality constraint report over orders
    (+ customer for referential integrity): completeness, uniqueness,
    distinctness, predicate compliance, and RI, each as one report row
    (constraint_name, metric, threshold, n_violations, passed).

    Plan shape: all row-level constraints fuse into ONE scan of
    orders (SUM(CASE) partial aggregation); the two key constraints
    share one groupBy pass per key; RI groups child keys before a
    left-anti join against the customer key set (broadcastable); the
    report rows come from a single stack() projection over the
    cross-joined one-row aggregates.  Adding a constraint adds a
    column to an existing pass, not a new pass — the property that
    makes the gate affordable at 100 TB.
    """
    t = load_tables(spark, sf_dir)
    orders = t["orders"]
    rm = row_metrics(
        orders,
        completeness=["o_custkey", "o_orderdate"],
        compliance=[
            Compliance("positive_totalprice", F.col("o_totalprice") > 0),
            Compliance("price_under_cap", F.col("o_totalprice") <= 300000),
            Compliance(
                "status_domain", F.col("o_orderstatus").isin("O", "F", "P")
            ),
        ],
    )
    okey = key_metrics(orders, "o_orderkey").select("v_uniqueness_o_orderkey")
    ckey = key_metrics(orders, "o_custkey")
    ri = referential_violations(orders, "o_custkey", t["customer"], "c_custkey")
    metrics = rm.crossJoin(okey).crossJoin(ckey).crossJoin(ri)
    return constraint_report(metrics, _CONSTRAINTS)


_DRIFT_SPLIT = "TIMESTAMP '1998-01-01 00:00:00'"
_DRIFT_METRICS = [
    "n_rows",
    "completeness_o_custkey",
    "avg_totalprice",
    "share_status_f",
    "n_custkeys",
]

# One snapshot's metric profile (DuckDB side). Averages go through
# integer cents (exact BIGINT sum, order-independent) so only the
# final division is floating point — the cross-engine double-sum trap.
_DRIFT_PROFILE_SQL = """
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             (floor((CAST(count(o_custkey) AS DOUBLE)
                     / greatest(count(*), 1)) * 1000000 + 0.5) / 1000000)
               AS completeness_o_custkey,
             (floor((CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT)) AS DOUBLE)
                     / (100.0 * greatest(count(o_totalprice), 1)))
                    * 10000 + 0.5) / 10000) AS avg_totalprice,
             (floor((CAST(sum(CASE WHEN o_orderstatus = 'F'
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / greatest(count(*), 1)) * 1000000 + 0.5) / 1000000)
               AS share_status_f,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custkeys
      FROM orders WHERE o_orderdate {op} {split}
"""


def _drift_row_sql(metric: str) -> str:
    return f"""
      SELECT '{metric}' AS metric_name,
             CAST(b.{metric} AS DOUBLE) AS base_value,
             CAST(c.{metric} AS DOUBLE) AS curr_value
      FROM b, c"""


@query(
    "dq_snapshot_drift",
    oracle="WITH b AS ("
    + _DRIFT_PROFILE_SQL.format(op="<", split=_DRIFT_SPLIT)
    + "), c AS ("
    + _DRIFT_PROFILE_SQL.format(op=">=", split=_DRIFT_SPLIT)
    + "), rows_ AS ("
    + " UNION ALL ".join(_drift_row_sql(m) for m in _DRIFT_METRICS)
    + """)
    SELECT metric_name, base_value, curr_value,
           (floor((abs(curr_value - base_value)
                   / greatest(abs(base_value), 1.0)) * 1000000 + 0.5)
            / 1000000) AS rel_delta,
           ((floor((abs(curr_value - base_value)
                    / greatest(abs(base_value), 1.0)) * 1000000 + 0.5)
             / 1000000) > 0.05) AS drifted
    FROM rows_
    """,
)
def dq_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: metric drift between two snapshots of the orders table
    (pre/post 1998 — stand-ins for yesterday's and today's partitions),
    the Deequ metrics-repository pattern: profile each snapshot once
    (count, completeness, cents-exact average price, status share,
    distinct customers), then report per-metric relative drift with a
    5% flag.  The drifted share_status_f row is the point: older orders
    skew 'F'illed, newer ones skew open — the kind of
    distribution shift a quality gate must catch before training data
    does.  Scale shape: two partition-prunable scans (each profile is
    one pass; the average runs through exact integer cents so no
    double-sum order dependence), then a stack() over one-row frames.
    """
    from ..operators.dq import drift_report

    t = load_tables(spark, sf_dir)
    split = F.to_timestamp(F.lit("1998-01-01 00:00:00"))

    def profile(df: DataFrame) -> DataFrame:
        from ..functions.rounding import round_det

        cents = F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        )
        n_price = F.greatest(F.count("o_totalprice"), F.lit(1))
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            round_det(
                F.count("o_custkey")
                / F.greatest(F.count(F.lit(1)), F.lit(1)),
                6,
            ).alias("completeness_o_custkey"),
            round_det(
                cents.cast("double") / (100.0 * n_price), 4
            ).alias("avg_totalprice"),
            round_det(
                F.sum(
                    F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
                )
                / F.greatest(F.count(F.lit(1)), F.lit(1)),
                6,
            ).alias("share_status_f"),
            F.count_distinct("o_custkey").alias("n_custkeys"),
        )

    orders = t["orders"]
    base = profile(orders.where(F.col("o_orderdate") < split))
    curr = profile(orders.where(F.col("o_orderdate") >= split))
    return drift_report(base, curr, _DRIFT_METRICS, threshold=0.05)


@query(
    "dq_k_anonymity",
    oracle="""
    WITH groups AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM customer GROUP BY 1, 2
    ),
    hist AS (
      SELECT group_size, CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM groups GROUP BY group_size
    )
    SELECT group_size, n_groups,
           CAST(CASE WHEN group_size < 5 THEN n_groups ELSE 0 END AS BIGINT)
             AS n_violating_groups,
           CAST(CASE WHEN group_size < 5 THEN group_size * n_groups ELSE 0 END
             AS BIGINT) AS n_exposed_rows
    FROM hist
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: k-anonymity verification over a quasi-identifier set — the
    privacy-governance gate a curation pipeline runs before release:
    every (nationkey, mktsegment) equivalence class must contain at
    least k=5 records, or the rows in it are re-identifiable by the
    quasi-identifiers alone (Sweeney 2002, public). Output is the
    group-size histogram with per-size violating-group and exposed-row
    counts — flat integers, so the verdict is cross-engine exact, and
    the histogram (not just a boolean) tells the operator HOW FAR from
    k the corpus is. Scale shape: one keyed groupBy on the
    quasi-identifiers, then a second groupBy on the BOUNDED group-size
    domain — same adding-a-constraint-adds-a-column economics as the
    dq report; at 100 TB the first aggregation is the only
    corpus-width pass."""
    t = load_tables(spark, sf_dir)
    k = 5
    groups = t["customer"].groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    hist = groups.groupBy("group_size").agg(
        F.count(F.lit(1)).alias("n_groups")
    )
    # the k-predicate is constant within a histogram row, so the
    # violation columns are projections of (group_size, n_groups)
    violating = F.col("group_size") < k
    return hist.select(
        "group_size",
        "n_groups",
        F.when(violating, F.col("n_groups"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_violating_groups"),
        F.when(violating, F.col("group_size") * F.col("n_groups"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_exposed_rows"),
    )
