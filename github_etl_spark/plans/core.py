"""Core relational operators (SURVEY.md §2.2-§2.7) over the fixture tables.

Each query exercises one operator row from the survey inventory, with a
reference citation in the docstring. Spark side is the DataFrame API so
Catalyst sees the full plan (pushdown, pruning, broadcast selection);
the DuckDB oracle is the semantic contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_det
from ..tables import load_tables
from .registry import query

# ---------------------------------------------------------------------------
# Projections / constants (P1-P5 — reference main.py:456-470,461,725-727)
# ---------------------------------------------------------------------------


@query(
    "p1_project_rename",
    oracle="""
    SELECT o_orderkey AS pull_request_id,
           o_orderstatus AS current_status,
           CAST(o_orderdate AS DATE) AS date_created,
           o_totalprice AS total_price
    FROM orders
    """,
)
def p1_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: 1:1 column projection + rename (reference main.py:456-470)."""
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        F.col("o_orderkey").alias("pull_request_id"),
        F.col("o_orderstatus").alias("current_status"),
        F.col("o_orderdate").cast("date").alias("date_created"),
        F.col("o_totalprice").alias("total_price"),
    )


@query(
    "p3_p5_constant_columns",
    oracle="""
    SELECT o_orderkey AS pull_request_id,
           CAST(NULL AS VARCHAR) AS author_email,
           'acme/widgets' AS target_repository,
           CAST('2026-01-15' AS DATE) AS snapshot_date
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def p3_p5_constant_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3-P5: NULL placeholder, repo tag, snapshot-date stamp
    (reference main.py:486,461,725-727)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select(
            F.col("o_orderkey").alias("pull_request_id"),
            F.lit(None).cast("string").alias("author_email"),
            F.lit("acme/widgets").alias("target_repository"),
            F.lit("2026-01-15").cast("date").alias("snapshot_date"),
        )
    )


# ---------------------------------------------------------------------------
# Filters (F1-F6 — reference main.py:335,369,228-230,449-453,513,576-578)
# ---------------------------------------------------------------------------


@query(
    "f1_f2_null_and_empty_filter",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE text IS NOT NULL AND text <> '' AND lang IS NOT NULL
    """,
)
def f1_f2_null_and_empty_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: drop NULL-user / empty-body rows (reference main.py:335,369).

    Python truthiness (`if body`) is encoded explicitly as
    IS NOT NULL AND <> '' so Spark and SQL three-valued logic agree
    (SURVEY.md §7.4 risk 2).
    """
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(
            F.col("text").isNotNull()
            & (F.col("text") != "")
            & F.col("lang").isNotNull()
        )
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "f4_bounded_numeric_predicate",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey < 750 AND o_custkey IS NOT NULL
    """,
)
def f4_bounded_numeric_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F4: missing-key skip + bounded numeric gate
    (reference main.py:228-230,449-453: bug ids must be < 1e8)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_custkey").isNotNull() & (F.col("o_custkey") < 750))
        .select("o_orderkey", "o_custkey")
    )


@query(
    "f6_partition_predicate",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'purchase' AND user_id = 7
    """,
)
def f6_partition_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6: conjunctive equality predicate — the probe/delete shape
    (reference main.py:513,576-578,626-627). On a partitioned layout this
    becomes partition pruning for free."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") == 7))
        .select("event_id", "user_id", "value")
    )


@query(
    "s8_existence_probe",
    oracle="""
    SELECT CAST(count(*) > 0 AS INTEGER) AS snapshot_exists
    FROM (
      SELECT 1 FROM orders
      WHERE o_orderstatus = 'F' AND o_custkey = 1
      LIMIT 1
    )
    """,
)
def s8_existence_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/J4/O2: `SELECT 1 ... LIMIT 1` existence probe as semi-join
    (reference main.py:573-588)."""
    t = load_tables(spark, sf_dir)
    probe = (
        t["orders"]
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_custkey") == 1))
        .select(F.lit(1).alias("one"))
        .limit(1)
    )
    return probe.agg((F.count("*") > 0).cast("int").alias("snapshot_exists"))


# ---------------------------------------------------------------------------
# Joins (J1-J5 — reference main.py:300-304,227-239,494-539)
# ---------------------------------------------------------------------------


@query(
    "j1_broadcast_lookup_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_type,
           l.l_quantity AS quantity
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    headline=True,
)
def j1_broadcast_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the N+1 detail-fetch (reference main.py:300-304) as a broadcast
    hash lookup join — dimension side is explicitly broadcast so the fact
    scan never shuffles (100 TB stance: `part` is the small side)."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "p_brand",
        "p_type",
        F.col("l_quantity").alias("quantity"),
    )


@query(
    "j2_enrichment_left_join",
    oracle="""
    SELECT o.o_orderkey AS pull_request_id,
           o.o_orderstatus AS current_status,
           COALESCE(c.n_commits, 0) AS n_commits,
           (floor((COALESCE(c.total_qty, 0.0)) * 100 + 0.5) / 100) AS total_qty
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey, count(*) AS n_commits, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
    ) c ON o.o_orderkey = c.l_orderkey
    """,
)
def j2_enrichment_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: parent→children enrichment (reference main.py:227-239) as a
    left join against a pre-aggregated child table. Aggregating before
    the join keeps the shuffled payload minimal (partial agg map-side)."""
    t = load_tables(spark, sf_dir)
    children = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_commits"),
            F.sum("l_quantity").alias("total_qty"),
        )
    )
    return (
        t["orders"]
        .join(children, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            F.col("o_orderkey").alias("pull_request_id"),
            F.col("o_orderstatus").alias("current_status"),
            F.coalesce(F.col("n_commits"), F.lit(0)).alias("n_commits"),
            round_det(F.coalesce(F.col("total_qty"), F.lit(0.0)), 2).alias("total_qty"),
        )
    )


@query(
    "j3_left_outer_status_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           o.o_orderpriority AS status
    FROM lineitem l
    LEFT JOIN (SELECT o_orderkey, o_orderpriority FROM orders
               WHERE o_orderstatus = 'F') o
      ON l.l_orderkey = o.o_orderkey
    """,
)
def j3_left_outer_status_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: comments→reviews status propagation (reference main.py:494-539):
    left outer lookup; unmatched rows keep NULL status."""
    t = load_tables(spark, sf_dir)
    reviews = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", F.col("o_orderpriority").alias("status"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(reviews), F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .select("l_orderkey", "l_linenumber", "status")
    )


@query(
    "j4_semi_join",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: EXISTS as a left-semi join (reference probe main.py:573-588)."""
    t = load_tables(spark, sf_dir)
    big = t["lineitem"].filter(F.col("l_quantity") >= 49).select("l_orderkey")
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "j5_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def j5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: NOT EXISTS as a left-anti join (IMPLIED — free join shape):
    customers with no urgent order. The unfiltered form (customers with
    no orders at all) returns ZERO rows at every test SF — a vacuous
    check that would hash-match even with a broken join — so the
    filtered right side keeps the result non-empty (18 / 203 / 1986
    rows at sf0.001/0.01/0.1) while exercising the same plan shape."""
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "j5_range_join",
    oracle="""
    SELECT a.user_id, a.event_id AS click_id, count(*) AS n_following
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'view'
    GROUP BY a.user_id, a.event_id
    """,
)
def j5_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: non-equi (range) join — views within 5 minutes after each click.

    Equi key (user_id) carries the shuffle; the range predicate is applied
    post-join so Spark still plans a hash join, not a cartesian product.
    """
    t = load_tables(spark, sf_dir)
    a = t["events"].filter(F.col("event_type") == "click").alias("a")
    b = t["events"].filter(F.col("event_type") == "view").alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.user_id").alias("user_id"), F.col("a.event_id").alias("click_id"))
        .agg(F.count("*").alias("n_following"))
    )


# ---------------------------------------------------------------------------
# Aggregations (A1, A4 — reference main.py:513-518)
# ---------------------------------------------------------------------------


@query(
    "a1_conditional_min",
    oracle="""
    SELECT user_id, MIN(ts) AS date_approved
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def a1_conditional_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: earliest-approval conditional min (reference main.py:513-518):
    `min(submitted_at) where state='APPROVED'` per PR → `min(ts) where
    event_type='purchase'` per user. Engine uses real timestamps, not
    lexicographic strings (SURVEY.md §7.4 risk 1)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("date_approved"))
    )


@query(
    "a4_group_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           (floor((SUM(l_quantity)) * 100 + 0.5) / 100) AS sum_qty,
           (floor((SUM(l_extendedprice)) * 100 + 0.5) / 100) AS sum_base_price,
           (floor((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100) AS sum_disc_price,
           (floor((SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100) AS sum_charge,
           (floor((AVG(l_quantity)) * 10000 + 0.5) / 10000) AS avg_qty,
           (floor((AVG(l_extendedprice)) * 10000 + 0.5) / 10000) AS avg_price,
           (floor((AVG(l_discount)) * 10000 + 0.5) / 10000) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def a4_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: TPC-H-Q1-shaped hash aggregate — partial (map-side) + final agg
    is Catalyst's default physical plan; sums rounded for cross-engine
    float stability."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_det(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_det(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            round_det(F.sum(disc_price), 2).alias("sum_disc_price"),
            round_det(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            round_det(F.avg("l_quantity"), 4).alias("avg_qty"),
            round_det(F.avg("l_extendedprice"), 4).alias("avg_price"),
            round_det(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "a4_distinct_counts",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a4_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: exact distinct aggregation (expand + two-phase agg in Spark)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query("a4_approx_distinct", sibling="approx_distinct_error")
# no oracle: HLL sketches differ across engines; sibling pins accuracy
def a4_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: approx_count_distinct (HyperLogLog++) — the 100 TB path for
    distincts; rows-only check since sketch estimates are engine-specific.
    Accuracy vs exact countDistinct is asserted in tests/test_queries.py
    AND as oracle-checked rows in the `approx_distinct_error` sibling."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"))
    )


@query(
    "approx_distinct_error",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
           CAST(1 AS INTEGER) AS within_3rsd
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy contract for `a4_approx_distinct` (its oracle-checked
    sibling — same pattern as minhash_estimate_error): per group the
    EXACT distinct count (oracle-replayable) plus the claim that the
    HLL++ estimate at rsd=0.02 lands within 3×rsd (6%) of it. The
    estimate itself is engine-specific, so the oracle cannot replay
    its VALUE — it replays the exact side and asserts the band flag is
    1; a Spark estimate outside the band emits 0 and hash-mismatches.
    The 3σ band holds with probability ~0.997 per group and the
    fixture groups sit far inside it (small cardinalities keep HLL++
    in its sparse, near-exact regime)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("exact_distinct"),
            F.approx_count_distinct("l_partkey", 0.02).alias("__est"),
        )
        .select(
            "l_returnflag",
            "exact_distinct",
            (
                F.abs(F.col("__est") - F.col("exact_distinct"))
                <= 0.06 * F.col("exact_distinct")
            )
            .cast("int")
            .alias("within_3rsd"),
        )
    )


@query(
    "a4_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           (floor((SUM(l_quantity)) * 100 + 0.5) / 100) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: rollup (hierarchical subtotals + grand total)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(round_det(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "a4_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a4_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: cube (all grouping-set combinations)."""
    t = load_tables(spark, sf_dir)
    return t["orders"].cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@query(
    "a4_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           (floor((SUM(o_totalprice)) * 100 + 0.5) / 100) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def a4_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: explicit grouping sets via spark.sql."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               (floor((SUM(o_totalprice)) * 100 + 0.5) / 100) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "a4_percentiles",
    oracle="""
    SELECT o_orderstatus,
           (floor((quantile_cont(o_totalprice, 0.5)) * 10000 + 0.5) / 10000) AS p50,
           (floor((quantile_cont(o_totalprice, 0.9)) * 10000 + 0.5) / 10000) AS p90,
           (floor((MIN(o_totalprice)) * 100 + 0.5) / 100) AS min_price,
           (floor((MAX(o_totalprice)) * 100 + 0.5) / 100) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a4_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: exact continuous percentiles (both engines interpolate linearly);
    `percentile_approx` is the 100 TB variant (sketch-based, rows-only)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            round_det(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            round_det(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            round_det(F.min("o_totalprice"), 2).alias("min_price"),
            round_det(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "a4_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'view') AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           count(*) FILTER (WHERE event_type = 'error') AS n_error
    FROM events
    GROUP BY user_id
    """,
)
def a4_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: pivot with an explicit value list (no extra pass to discover
    distinct keys — required at scale)."""
    t = load_tables(spark, sf_dir)
    kinds = ["click", "view", "purchase", "signup", "error"]
    df = t["events"].groupBy("user_id").pivot("event_type", kinds).count().na.fill(0, kinds)
    return df.withColumnsRenamed({k: f"n_{k}" for k in kinds})


# ---------------------------------------------------------------------------
# Explode / nested (E1-E3 — reference main.py:474-491,465-469)
# ---------------------------------------------------------------------------


@query(
    "e1_double_explode_roundtrip",
    oracle="""
    SELECT l_orderkey, l_suppkey, l_partkey, l_quantity
    FROM lineitem
    """,
)
def e1_double_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: the commit×file double flatten (reference main.py:474-491).

    The nested document is rebuilt from the flat fixture
    (order → [supplier → [parts]]) with collect_list(struct(...)), then
    double-exploded back; the oracle is the original flat table, so the
    round trip proves explode semantics exactly.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    level1 = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.collect_list(F.struct("l_partkey", "l_quantity")).alias("files")
    )
    nested = level1.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_suppkey", "files")).alias("commit_data")
    )
    exploded = nested.select(
        "l_orderkey", F.explode("commit_data").alias("c")
    ).select(
        "l_orderkey", F.col("c.l_suppkey").alias("l_suppkey"), F.explode("c.files").alias("f")
    )
    return exploded.select(
        "l_orderkey",
        "l_suppkey",
        F.col("f.l_partkey").alias("l_partkey"),
        F.col("f.l_quantity").alias("l_quantity"),
    )


@query(
    "e3_array_transform",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '), x -> upper(x)), ',')
             AS labels,
           len(string_split(p_name, ' ')) AS n_labels
    FROM part
    """,
)
def e3_array_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: array-of-struct projection via higher-order transform
    (reference labels extraction main.py:465-469)."""
    t = load_tables(spark, sf_dir)
    words = F.split(F.col("p_name"), " ")
    return t["part"].select(
        "p_partkey",
        F.array_join(F.transform(words, lambda x: F.upper(x)), ",").alias("labels"),
        F.size(words).alias("n_labels"),
    )


# ---------------------------------------------------------------------------
# Scalar functions (C1-C11 — reference main.py:25,449-454,530-532,...)
# ---------------------------------------------------------------------------

# Canonical definition lives in functions/text.py; re-exported here for
# the catalog entries (and plans/etl.py) that reference it.
from ..functions.text import BUG_RE, bug_id_expr  # noqa: E402,F401


@query(
    "c1_regex_bug_id",
    oracle="""
    WITH titled AS (
      SELECT o_orderkey,
             CASE
               WHEN o_orderstatus = 'P' THEN 'Update documentation'
               WHEN o_orderstatus = 'F' THEN
                 'Bug ' || CAST(o_orderkey + 100000000 AS VARCHAR)
                 || ' and b=' || CAST(o_orderkey AS VARCHAR) || ' fix'
               ELSE 'Bug #' || CAST(o_orderkey AS VARCHAR) || ' - patch'
             END AS title
      FROM orders
    )
    SELECT o_orderkey, title,
           CAST(list_filter(regexp_extract_all(title, '(?i)\\b(?:bug|b=)\\s*#?(\\d+)\\b', 1),
                            x -> TRY_CAST(x AS BIGINT) < 100000000)[1] AS BIGINT) AS bug_id
    FROM titled
    """,
)
def c1_regex_bug_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 end-to-end on synthesized titles covering all reference test
    cases (tests/test_transform_data.py:35-113): plain match, `b=`,
    `#`-prefixed, over-limit id followed by a valid one, and no-match."""
    t = load_tables(spark, sf_dir)
    title = (
        F.when(F.col("o_orderstatus") == "P", F.lit("Update documentation"))
        .when(
            F.col("o_orderstatus") == "F",
            F.concat(
                F.lit("Bug "),
                (F.col("o_orderkey") + 100000000).cast("string"),
                F.lit(" and b="),
                F.col("o_orderkey").cast("string"),
                F.lit(" fix"),
            ),
        )
        .otherwise(
            F.concat(F.lit("Bug #"), F.col("o_orderkey").cast("string"), F.lit(" - patch"))
        )
    )
    return t["orders"].select(
        "o_orderkey",
        title.alias("title"),
        bug_id_expr(title).alias("bug_id"),
    )


@query(
    "c2_char_count",
    oracle="""
    SELECT doc_id, COALESCE(length(text), 0) AS character_count
    FROM documents
    """,
)
def c2_char_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: `character_count = len(body)`, 0 for NULL/empty
    (reference main.py:530-532)."""
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id", F.coalesce(F.length("text"), F.lit(0)).alias("character_count")
    )


@query(
    "c4_c5_date_and_cast",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS snapshot_date_str,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(floor(o_totalprice) AS BIGINT) AS price_int
    FROM orders
    """,
)
def c4_c5_date_and_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/C5: date formatting + integer casts (reference main.py:710,827,452)."""
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("snapshot_date_str"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.floor("o_totalprice").cast("long").alias("price_int"),
    )


@query(
    "c10_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE props IS NOT NULL
    """,
)
def c10_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: JSON decode at the boundary (reference resp.json(),
    main.py:218,299): schema-on-read extraction from a JSON string col."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("props").isNotNull())
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        )
    )


@query(
    "c11_math_revenue",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100) AS net_price,
           (floor((abs(l_extendedprice - l_quantity * 1000)) * 100 + 0.5) / 100) AS price_gap
    FROM lineitem
    """,
)
def c11_math_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: arithmetic / round / abs on fixture columns."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        round_det(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net_price"),
        round_det(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 2).alias(
            "price_gap"
        ),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops (O1-O4)
# ---------------------------------------------------------------------------


@query(
    "o3_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def o3_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: global top-k — Spark plans TakeOrderedAndProject (no full sort);
    deterministic tiebreak on the key."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "o4_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def o4_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: union + dedup."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = t["orders"].filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return a.unionByName(b).distinct()


@query(
    "o4_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def o4_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: intersect (customers with both finished and open orders)."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = t["orders"].filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@query(
    "o4_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def o4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: except (customers with no open orders)."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].select("c_custkey")
    b = t["orders"].filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.subtract(b)


@query(
    "o4_except_all",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def o4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: multiset EXCEPT ALL — duplicates survive by multiplicity
    (a customer with 5 orders, 2 open, keeps 3 rows), the bag
    semantics `subtract`'s set form erases."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].select(F.col("o_custkey").alias("c_custkey"))
    b = t["orders"].filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.exceptAll(b)


@query(
    "o4_intersect_all",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
    """,
)
def o4_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: multiset INTERSECT ALL — each key appears min(count_left,
    count_right) times."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    b = t["orders"].filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersectAll(b)


@query(
    "s8_param_sql_probe",
    oracle="""
    SELECT o_orderkey AS pull_request_id, o_orderdate AS date_created
    FROM orders
    WHERE o_orderstatus = 'F' AND o_custkey < 100
    """,
)
def s8_param_sql_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3: the reference's delegated parameterized SQL
    (ScalarQueryParameter probe, main.py:573-586) as first-class
    `spark.sql` with named parameters — no external engine, no string
    interpolation (injection-safe like the original)."""
    load_tables(spark, sf_dir)  # registers the temp views
    return spark.sql(
        """
        SELECT o_orderkey AS pull_request_id, o_orderdate AS date_created
        FROM orders
        WHERE o_orderstatus = :status AND o_custkey < :max_cust
        """,
        args={"status": "F", "max_cust": 100},
    )


@query(
    "j6_salted_skew_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name,
           l.l_quantity AS quantity
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def j6_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof join (operators/partitioning.salted_join): big side
    salted by row hash, small side replicated per salt, join on
    (key, salt). Row-identical to the plain join — which is exactly what
    the oracle checks. For the pathological hot key AQE's post-shuffle
    skew split can't fix (SURVEY.md §2.3 key-distribution note)."""
    from ..operators.partitioning import salted_join

    t = load_tables(spark, sf_dir)
    lineitem = t["lineitem"].withColumnRenamed("l_suppkey", "suppkey")
    supplier = t["supplier"].withColumnRenamed("s_suppkey", "suppkey")
    return salted_join(lineitem, supplier, "suppkey", salt_buckets=8).select(
        "l_orderkey",
        "l_linenumber",
        "s_name",
        F.col("l_quantity").alias("quantity"),
    )


@query(
    "a4_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, CAST(value AS DOUBLE) AS value
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem WHERE l_orderkey % 100 = 0
    )
    UNPIVOT INCLUDE NULLS (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
)
def a4_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of a4_pivot): wide measure columns →
    (metric, value) long form — `DataFrame.unpivot`, Spark's Expand
    operator, one output row per (row × measure), no shuffle."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
        )
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount"],
            variableColumnName="metric",
            valueColumnName="value",
        )
    )


@query("a4_hll_sketch", sibling="hll_sketch_error")
# sketch bytes are engine-specific → rows-only; sibling pins accuracy
def a4_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch aggregation: per-group Datasketches HLL sketches
    merged with hll_union_agg — the re-aggregatable form of
    approx_count_distinct (build per partition/day, union across any
    grouping later without rescanning). Estimate accuracy is asserted
    against exact counts in tests AND as oracle-checked rows in the
    `hll_sketch_error` sibling (including the MERGED estimate)."""
    t = load_tables(spark, sf_dir)
    per_flag = t["lineitem"].groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_suppkey").alias("sketch"),
        F.count_distinct("l_suppkey").alias("exact_distinct"),
    )
    return per_flag.select(
        "l_returnflag",
        "exact_distinct",
        F.hll_sketch_estimate("sketch").alias("estimate"),
    ).unionByName(
        per_flag.agg(
            F.lit("ALL").alias("l_returnflag"),
            F.lit(None).cast("long").alias("exact_distinct"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate"),
        )
    )


@query(
    "hll_sketch_error",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_distinct,
           CAST(1 AS INTEGER) AS within_3rsd
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'ALL' AS l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_distinct,
           CAST(1 AS INTEGER) AS within_3rsd
    FROM lineitem
    """,
)
def hll_sketch_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy contract for `a4_hll_sketch` (its oracle-checked
    sibling): per group AND for the hll_union_agg-MERGED sketch, the
    EXACT distinct supplier count plus the claim that the Datasketches
    estimate lands within 6% of it (default lgConfigK=12 → rsd ≈
    1.04/√4096 ≈ 1.6%, so 6% is nearly 4σ — and the merged-sketch
    check is the one that matters: a bad union fold would blow the
    band even when every per-group sketch is fine). Oracle replays the
    exact side and asserts the band flags; an out-of-band estimate
    emits 0 and hash-mismatches."""
    t = load_tables(spark, sf_dir)
    per_flag = t["lineitem"].groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_suppkey").alias("sketch"),
        F.count_distinct("l_suppkey").alias("exact_distinct"),
    )
    band = lambda est, exact: (  # noqa: E731
        (F.abs(est - exact) <= 0.06 * exact).cast("int").alias("within_3rsd")
    )
    merged = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("__est")
    ).crossJoin(
        F.broadcast(
            t["lineitem"].agg(
                F.count_distinct("l_suppkey").alias("exact_distinct")
            )
        )
    )
    return per_flag.select(
        "l_returnflag",
        "exact_distinct",
        band(F.hll_sketch_estimate("sketch"), F.col("exact_distinct")),
    ).unionByName(
        merged.select(
            F.lit("ALL").alias("l_returnflag"),
            "exact_distinct",
            band(F.col("__est"), F.col("exact_distinct")),
        )
    )


@query(
    "c12_fuzzy_match_levenshtein",
    oracle="""
    SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
           levenshtein(a.s_name, b.s_name) AS edit_dist
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey
     AND a.s_suppkey < b.s_suppkey
     AND levenshtein(a.s_name, b.s_name) <= 2
    """,
)
def c12_fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution primitive: near-identical name pairs within a
    blocking key (nation), edit distance ≤ 2. Both engines implement
    plain Levenshtein identically, so the oracle is exact. Blocked
    self-join — the block bound is what keeps this O(Σ block²), never
    corpus²; at 100 TB add a cheap length/prefix pre-filter inside the
    block before paying the O(mn) distance."""
    t = load_tables(spark, sf_dir)
    a = t["supplier"].select(
        F.col("s_suppkey").alias("key_a"),
        F.col("s_name").alias("name_a"),
        F.col("s_nationkey").alias("nk"),
    )
    b = t["supplier"].select(
        F.col("s_suppkey").alias("key_b"),
        F.col("s_name").alias("name_b"),
        F.col("s_nationkey").alias("nk"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "nk")
        .filter((F.col("key_a") < F.col("key_b")) & (dist <= 2))
        .select("key_a", "key_b", dist.alias("edit_dist"))
    )


@query(
    "tpch_q3_shipping_priority",
    headline=True,
    oracle="""
    WITH agg AS (
      SELECT l.l_orderkey,
             (floor((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5)
              / 100) AS revenue,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    )
    SELECT * FROM agg
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dim filter →
    3-way join → hash aggregate → top-10. Catalyst broadcasts the
    filtered customer side under AQE, both date filters reach the
    parquet scans (PushedFilters), and the top-10 is
    TakeOrderedAndProject on the ROUNDED revenue (deterministic
    cross-engine rank, same contract as the BM25/RRF rankings)."""
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1997-03-15 00:00:00").cast("timestamp")
    agg = (
        t["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            round_det(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )
    return agg.orderBy(
        F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
    ).limit(10)


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           (floor((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5)
            / 100) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the 6-way join with the
    same-nation customer↔supplier constraint. region/nation/supplier/
    customer are broadcast-sized dims (AQE picks broadcast joins);
    the only big-side shuffles are the orders↔lineitem equi-join keys.
    Revenue rounded for cross-engine float stability (sum order
    differs between engines)."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            round_det(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): a date-sliced fact
    scan probed by an EXISTS with a non-equi residual (l_shipdate >
    o_orderdate — the fixtures carry no commit/receipt dates, so the
    reference's late-shipment predicate is expressed on shipdate).
    Spark plans the correlated EXISTS as a left-semi hash join on
    l_orderkey with the residual as a join condition; the quarter
    filter reaches the orders scan (PushedFilters)."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-07-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    late = orders.join(
        t["lineitem"],
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join with a predicate in the ON clause (customers keep their row
    even when every order is filtered away), per-customer count, then a
    second aggregation over the counts. Two shuffles by design — the
    first keyed on c_custkey, the second on the (tiny-cardinality)
    count value; the second aggregate's input is one row per customer,
    so the distribution agg is broadcast-light at any scale."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(
            t["orders"].where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q18_large_volume_customer",
    headline=True,
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, SUM(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): HAVING-subquery →
    semi-join → enrich → re-aggregate. The big-order key set is a
    pre-aggregation of lineitem (map-side partial sums fold each order
    to one row before the shuffle); the IN becomes a left-semi join
    that prunes lineitem AND orders before the customer join, so the
    expensive re-aggregation runs only over qualifying orders (~2% of
    the fact at the TPC-H quantity skew)."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    orders = t["orders"].join(
        big, t["orders"]["o_orderkey"] == big["l_orderkey"], "left_semi"
    )
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


@query(
    "j7_bloom_prefilter_join",
    headline=True,
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS order_count,
           (floor(SUM(o.o_totalprice) * 100 + 0.5) / 100) AS total_price
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_mktsegment = 'BUILDING')
    GROUP BY o.o_orderpriority
    """,
)
def j7_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi join (operators/bloom.py): the probe side's
    key FINGERPRINT (an 8 KiB bitmap, not its rows) pre-filters the
    fact scan before the shuffle, then the exact semi join removes the
    false positives — final rows identical to the plain EXISTS oracle.

    100 TB shape: when the dimension outgrows the broadcast threshold,
    a plain semi join shuffles the full fact table; the bloom keeps the
    exchange at (selectivity + fpp) of the fact bytes. Same mechanism
    as Spark's runtime row-level filtering (SPARK-32268), explicit and
    deterministic so it is oracle-verifiable."""
    from ..operators.bloom import bloom_prefilter_join

    t = load_tables(spark, sf_dir)
    probe = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    joined = bloom_prefilter_join(
        t["orders"], probe, "o_custkey", "c_custkey", "semi", num_bits=1 << 16
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count"),
        round_det(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "a5_regression_agg",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(epoch(ts) AS DOUBLE) / 86400.0 AS x,
             value AS y
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           (floor(regr_slope(y, x) * 10000 + 0.5) / 10000) AS slope,
           (floor(AVG(y) * 100 + 0.5) / 100) AS avg_y,
           (floor(corr(y, x) * 10000 + 0.5) / 10000) AS corr_xy
    FROM pts GROUP BY event_type
    """,
)
def a5_regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in linear-regression aggregates (trend per event type):
    regr_slope / regr_intercept / corr over (epoch-day, value) pairs.
    Single hash aggregate with map-side partial moments — the moment
    sketches (n, Σx, Σy, Σxy, Σx², Σy²) merge associatively, so this
    is one shuffle of 6 doubles per key regardless of data size.
    x is rescaled to DAYS so slope magnitudes survive the deterministic
    4-digit rounding both engines apply. regr_intercept is deliberately
    NOT exposed: it extrapolates to epoch day 0, ~19k days outside the
    data, amplifying engine-specific moment-accumulation ulps past any
    stable rounding (observed: cent-level flips vs DuckDB)."""
    t = load_tables(spark, sf_dir)
    pts = t["events"].where(F.col("value").isNotNull()).select(
        "event_type",
        (F.unix_seconds(F.col("ts").cast("timestamp")).cast("double") / 86400.0).alias("x"),
        F.col("value").alias("y"),
    )
    return pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        round_det(F.regr_slope("y", "x"), 4).alias("slope"),
        round_det(F.avg("y"), 2).alias("avg_y"),
        round_det(F.corr("y", "x"), 4).alias("corr_xy"),
    )


@query(
    "a6_value_histogram",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                  WHEN o_totalprice >= 600000.0 THEN 25
                  ELSE CAST(floor(o_totalprice / 25000.0) AS BIGINT) + 1
             END AS bucket
      FROM orders
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM b GROUP BY bucket
    """,
)
def a6_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via width_bucket — the deterministic
    histogram shape (histogram_numeric's adaptive bins are
    engine-specific; fixed-width bucketing replays exactly — the
    oracle spells it as floor arithmetic since DuckDB lacks
    width_bucket). One aggregation whose
    output is bucket-count-sized; at any scale the shuffle carries at
    most buckets+2 rows per map partition."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(24)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "j7_bloom_broadcast_regime",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_acctbal > 5000)
    GROUP BY o.o_orderstatus
    """,
)
def j7_bloom_broadcast_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bloom pre-filter's LARGE-bitmap regime (operators/bloom.py:
    bloom_broadcast_filter), forced via max_literal_words=0: the bitmap
    probes as a broadcast (word_idx, bits) table through k map-side
    joins instead of a plan literal — the shape that stays viable when
    the dimension's key count pushes the bitmap past what a codegen
    literal tolerates (the literal is recompiled per union branch of
    the fact plan; measured ~80 s at 35k words x 32 branches). Exact
    semi join after the screen keeps the result row-identical to the
    plain EXISTS oracle, so BOTH probe regimes carry an oracle check
    (the literal regime is j7_bloom_prefilter_join)."""
    from ..operators.bloom import bloom_prefilter_join

    t = load_tables(spark, sf_dir)
    probe = t["customer"].where(F.col("c_acctbal") > 5000)
    joined = bloom_prefilter_join(
        t["orders"], probe, "o_custkey", "c_custkey", "semi",
        num_bits=1 << 16, max_literal_words=0,
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "tpch_q12_priority_classes",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): pivoted
    conditional counting — CASE inside SUM turns one pass over the
    join into two priority-class tallies per group (the fixtures carry
    no l_shipmode/l_commitdate, so the class predicate rides on
    o_orderpriority and the group on l_returnflag; the operator shape —
    join + conditional aggregate — is Q12's). The year filter reaches
    the lineitem scan; partial aggregation folds each map task to ≤
    |groups| rows before the single exchange."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "a7_share_of_total",
    oracle="""
    WITH nation_rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             SUM(o.o_totalprice) AS rev
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT nation, region,
           (floor(rev * 100 + 0.5) / 100) AS revenue,
           (floor(rev / SUM(rev) OVER (PARTITION BY region) * 1000000 + 0.5)
            / 1000000) AS share_of_region,
           (floor(rev / SUM(rev) OVER () * 1000000 + 0.5)
            / 1000000) AS share_of_total
    FROM nation_rev
    """,
)
def a7_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-group / percent-of-total — the ratio-to-report window
    shape every BI layer generates. One keyed aggregation first (the
    window then runs over NATION-sized rows, not the fact table), a
    region-partitioned window sum and an unpartitioned one on top.
    The single-partition global window is safe exactly because its
    input is the aggregate's group cardinality, not data volume."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    rev = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    return rev.select(
        "nation",
        "region",
        round_det(F.col("rev"), 2).alias("revenue"),
        round_det(
            F.col("rev") / F.sum("rev").over(W.partitionBy("region")), 6
        ).alias("share_of_region"),
        round_det(F.col("rev") / F.sum("rev").over(W.partitionBy()), 6).alias(
            "share_of_total"
        ),
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           -- per-ROW cents then integer sum: a double SUM's engine-
           -- specific accumulation order flips cent rounding right at
           -- a .5 boundary (observed on one customer at sf0.01)
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_cents DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): quarter-sliced orders
    joined to R-flagged lineitems, customer+nation enrichment, top-20
    by revenue. Both selective predicates reach their scans; nation
    broadcasts; the top-20 is TakeOrderedAndProject on the rounded
    revenue with a custkey tiebreak (deterministic cross-engine)."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-07-01 00:00:00").cast("timestamp")
    agg = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(
            t["lineitem"].where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("revenue_cents")
        )
    )
    return agg.orderBy(
        F.col("revenue_cents").desc(), F.col("c_custkey").asc()
    ).limit(20)


@query(
    "tpch_q14_promo_share",
    oracle="""
    SELECT (floor(
             100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5)
            / 10000) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): conditional revenue share in
    one pass — CASE-gated numerator and full denominator in the same
    aggregate, so the month of lineitems is scanned once, the part
    dimension broadcasts, and the output is a single global ratio."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-03-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            round_det(100.0 * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             -- rounded BEFORE the value-equality join: raw-double
             -- equality across engines is an ulp trap
             (floor(AVG(l_extendedprice / l_quantity) * 100 + 0.5) / 100)
               AS unit_price
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(unit_price) AS min_price FROM unit
      GROUP BY l_partkey
    )
    SELECT u.l_partkey,
           CAST(MIN(u.l_suppkey) AS BIGINT) AS best_suppkey,
           MIN(b.min_price) AS unit_price
    FROM unit u JOIN best b
      ON u.l_partkey = b.l_partkey AND u.unit_price = b.min_price
    GROUP BY u.l_partkey
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated-MIN
    subquery — aggregate per (part, supplier), take the per-part
    minimum, join back on VALUE equality to recover which supplier
    achieves it (ties broken by min suppkey). The equality join runs
    on the deterministically ROUNDED price: joining raw doubles
    computed independently by two engines is a correctness trap (an
    ulp of divergence silently drops the row), so the rounding is part
    of the shape's cross-engine contract. Both aggregations are
    map-side-combined; the value join is supplier-cardinality-sized."""
    t = load_tables(spark, sf_dir)
    unit = (
        t["lineitem"]
        .where(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            round_det(
                F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 2
            ).alias("unit_price")
        )
    )
    best = unit.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_price").alias("min_price")
    )
    return (
        unit.join(
            best,
            (F.col("l_partkey") == F.col("bp"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .groupBy("l_partkey")
        .agg(
            F.min("l_suppkey").cast("long").alias("best_suppkey"),
            F.min("min_price").alias("unit_price"),
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT (floor(SUM(l_extendedprice * l_discount) * 100 + 0.5) / 100)
             AS revenue_delta,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the pure
    scan-filter-aggregate — every predicate is scan-pushable
    (PushedFilters carries all four), no join, no shuffle beyond the
    single partial-agg exchange; the canonical measure of raw scan
    throughput."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            round_det(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): revenue view + scalar-MAX
    subquery + equality join back — the argmax-against-a-global-scalar
    form (Q2's per-group argmin, taken global). Revenue is per-row
    integer cents (engine-stable), so the equality against the scalar
    max is exact; the supplier join broadcasts. All suppliers tied at
    the max are returned, exactly like the reference SQL."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    rev = (
        t["lineitem"]
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(F.sum(cents).cast("long").alias("total_cents"))
    )
    mx = rev.agg(F.max("total_cents").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_cents") == F.col("mx"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_cents")
    )


@query(
    "tpch_q11_important_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS part_cents
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_cents
    FROM rev
    WHERE part_cents > (SELECT floor(1.05 * AVG(part_cents) * 10000 + 0.5)
                               / 10000 FROM rev)
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-key totals filtered
    against a FRACTION of the global total — the scalar-subquery
    threshold form. One keyed aggregation feeds both the per-part rows
    and (via a second tiny aggregate, broadcast back) the global
    denominator; integer-cents revenue on one side and a
    deterministically 4dp-rounded threshold on the other keep the >
    comparison exact across engines. The threshold
    is mean-RELATIVE (105% of the average part's revenue) so the query
    stays non-trivial at every scale factor — the spec's own fraction
    scales with SF for the same reason."""
    t = load_tables(spark, sf_dir)
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    rev = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(F.sum(cents).cast("long").alias("part_cents"))
        .localCheckpoint()  # feeds both the rows and the global denominator
    )
    # Threshold rounded to a 4dp grid BEFORE the comparison (same
    # contract as Q17/Q22): a raw 1.05*AVG double computed
    # independently by each engine could flip membership at ulp
    # distance for a part landing exactly on the threshold.
    total = rev.agg(round_det(1.05 * F.avg("part_cents"), 4).alias("threshold"))
    return (
        rev.crossJoin(F.broadcast(total))
        .where(F.col("part_cents") > F.col("threshold"))
        .select("l_partkey", "part_cents")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey,
             (floor(0.5 * AVG(l_quantity) * 10000 + 0.5) / 10000) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT (floor(SUM(l.l_extendedprice) / 7.0 * 100 + 0.5) / 100)
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN avg_qty a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < a.half_avg
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    per-group AVG threshold — each lineitem compared against half its
    part's average quantity. The subquery becomes one keyed aggregate
    joined back on the part key; the threshold is rounded
    deterministically BEFORE the comparison (a raw cross-engine double
    `<` flips rows at ulp distance, same contract as the Q2 equality
    join). Both the aggregate and the join shuffle once on l_partkey."""
    t = load_tables(spark, sf_dir)
    half_avg = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("ap"))
        .agg(round_det(0.5 * F.avg("l_quantity"), 4).alias("half_avg"))
    )
    return (
        t["lineitem"]
        .join(half_avg, F.col("l_partkey") == F.col("ap"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            round_det(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle="""
    SELECT (floor(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5)
            / 100) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    OR-of-ANDs spanning both join sides. Catalyst splits the
    disjunction: the quantity bounds' union (l_quantity <= 30) is
    derived and PUSHED to the lineitem scan while the residual OR
    evaluates after the broadcast join — the optimization this shape
    exists to test."""
    t = load_tables(spark, sf_dir)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            round_det(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH positive AS (
      SELECT (floor(AVG(c_acctbal) * 100 + 0.5) / 100) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           (floor(SUM(c.c_acctbal) * 100 + 0.5) / 100) AS total_bal
    FROM customer c CROSS JOIN positive p
    WHERE c.c_acctbal > p.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers who never placed an URGENT order (the fixtures' customers
    almost all ordered, so the spec's never-ordered predicate is
    vacuous; the urgency filter keeps the identical shape non-trivial
    at every SF) — scalar-subquery filter (broadcast
    1-row average, rounded before the comparison) composed with an
    ANTI join against the fact table, then a nation-level rollup. The
    anti join is the only fact-sized operation; everything else is
    dimension-sized."""
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .where(F.col("c_acctbal") > 0)
        .agg(round_det(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].where(F.col("o_orderpriority") == "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            round_det(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "tpch_q7_nation_volume",
    headline=True,
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS volume_cents
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): the two-sided nation-pair
    constraint — the SAME dimension (nation) joined twice under
    different roles (supplier side, customer side) with a symmetric
    pair disjunction, grouped by extracted year. Both nation sides
    broadcast; the only big-side shuffles are the fact equi-joins;
    volume in integer cents for the cross-engine contract."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(cents).cast("long").alias("volume_cents"))
    )


@query(
    "tpch_q21_waiting_supplier",
    headline=True,
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate
      GROUP BY l.l_orderkey, l.l_suppkey
    )
    SELECT lt.l_suppkey AS s_suppkey,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late lt
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = lt.l_orderkey
                    AND l2.l_suppkey <> lt.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = lt.l_orderkey
                        AND l3.l_suppkey <> lt.l_suppkey)
    GROUP BY lt.l_suppkey
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    double-correlated EXISTS / NOT EXISTS — the supplier was LATE on a
    multi-supplier order (semi join, different-supplier residual) and
    was the ONLY late one (anti join on the same late relation). The
    late relation is deduped to (order, supplier) grain first and
    localCheckpointed — it feeds the probe AND both correlations, and
    Spark will not share the subplan across the three branches
    otherwise. Lateness = shipped after the order date (the fixtures
    carry no commit/receipt dates; same adaptation as Q4)."""
    t = load_tables(spark, sf_dir)
    late = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .localCheckpoint()
    )
    other_line = t["lineitem"].select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        late.join(
            other_line,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT) AS cents,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           (floor(CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                                THEN cents ELSE 0 END) AS DOUBLE)
                  / SUM(cents) * 1000000 + 0.5) / 1000000) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of a
    region's purchase volume by year — the conditional-ratio form of
    Q7's dual-role nation join (customer nation filters the REGION,
    supplier nation gates the NUMERATOR). Numerator and denominator are
    exact integer cents from the same pass, so the share is a ratio of
    two bigints — deterministically roundable cross-engine."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("nk2"), F.col("n_regionkey").alias("rk2")
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    vol = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .join(F.broadcast(t["region"]), F.col("rk2") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("cents")).otherwise(0)
    )
    return vol.groupBy("o_year").agg(
        round_det(num.cast("double") / F.sum("cents"), 6).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Synthesized partsupp: the driver fixtures carry no partsupp table
# (TESTDATA.md), so the three remaining classic TPC-H shapes — Q9, Q16,
# Q20 — derive one deterministically from lineitem's distinct
# (l_partkey, l_suppkey) pairs. ps_supplycost / ps_availqty are pure
# integer-mod expressions of the keys, so DuckDB replays the synthesis
# bit-for-bit (same pattern as multimodal.synthesize_media's payloads:
# the fixture IS an expression, not a file). Deriving pairs from
# lineitem rather than part × supplier guarantees every lineitem row
# joins its partsupp row, which is what Q9's 6-way join needs.

_PARTSUPP_CTE = """partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             ((ps_partkey * 37 + ps_suppkey * 13) % 80000) / 100.0 + 100.0
               AS ps_supplycost,
             CAST((ps_partkey * 31 + ps_suppkey * 7) % 9999 + 1 AS BIGINT)
               AS ps_availqty
      FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                            l_suppkey AS ps_suppkey
            FROM lineitem)
    )"""


def synth_partsupp(lineitem: DataFrame) -> DataFrame:
    """partsupp from lineitem's distinct (part, supplier) pairs with
    key-derived cost/quantity columns (see module comment above). One
    shuffle (the distinct); both derived columns are exact integer
    arithmetic feeding one double division, identical across engines."""
    return (
        lineitem.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .select(
            "ps_partkey",
            "ps_suppkey",
            (
                F.pmod(
                    F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 13,
                    F.lit(80000),
                )
                / 100.0
                + 100.0
            ).alias("ps_supplycost"),
            (
                F.pmod(
                    F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7,
                    F.lit(9999),
                )
                + 1
            )
            .cast("long")
            .alias("ps_availqty"),
        )
    )


@query(
    "tpch_q9_product_type_profit",
    headline=True,
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    profit AS (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                         - ps.ps_supplycost * l.l_quantity) * 100 + 0.5)
                  AS BIGINT) AS amount_cents
      FROM lineitem l
      JOIN part p      ON p.p_partkey = l.l_partkey
      JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                     AND ps.ps_suppkey = l.l_suppkey
      JOIN supplier s  ON s.s_suppkey = l.l_suppkey
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN nation n    ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    SELECT nation, o_year,
           CAST(SUM(amount_cents) AS BIGINT) AS profit_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM profit GROUP BY nation, o_year
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit = revenue minus
    supply cost, rolled up by supplier nation and order year across a
    6-way join (lineitem × part × partsupp × supplier × orders ×
    nation). The part-name filter lands BEFORE the wide joins
    (predicate pushdown shrinks the probe side ~8×); nation (25 rows)
    is broadcast; the partsupp and orders joins shuffle on their keys
    and AQE picks broadcast where the filtered side fits. Profit is
    summed as per-row integer cents, so the cross-engine aggregate is
    exact. partsupp itself is the deterministic synthesis above —
    DuckDB rebuilds it inside the oracle's CTE."""
    t = load_tables(spark, sf_dir)
    ps = synth_partsupp(t["lineitem"])
    amount_cents = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("ps_supplycost") * F.col("l_quantity")
        )
        * 100
        + 0.5
    ).cast("long")
    return (
        t["lineitem"]
        .join(
            t["part"].where(F.col("p_name").like("%red%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount_cents.alias("amount_cents"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.sum("amount_cents").cast("long").alias("profit_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    counts per (brand, type, size) with NOT-IN supplier exclusion.
    The reference spec excludes complaint suppliers; the fixture's
    supplier table has no comment column, so negative account balance
    stands in (deterministic, 6 of 100 suppliers at sf0.01). The NOT IN
    becomes a broadcast LEFT ANTI join (the exclusion list is a
    filtered dimension, always tiny relative to partsupp); the
    countDistinct shuffles once on the 3 group keys."""
    t = load_tables(spark, sf_dir)
    ps = synth_partsupp(t["lineitem"])
    bad_suppliers = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    sized_parts = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        ps.join(
            F.broadcast(bad_suppliers),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(sized_parts, F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_excess_inventory_suppliers",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             floor(2000.0 * SUM(l_quantity) * 10000 + 0.5) / 10000
               AS qty_threshold
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, s.s_nationkey
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT ps.ps_suppkey
      FROM partsupp ps
      JOIN red_parts rp ON rp.p_partkey = ps.ps_partkey
      JOIN shipped sh   ON sh.l_partkey = ps.ps_partkey
                       AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > sh.qty_threshold
    )
    """,
)
def tpch_q20_excess_inventory_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers holding
    more stock of a name-filtered part than a multiple of what they
    shipped in a year — the nested semi-join with a doubly-correlated
    aggregate threshold. The spec's 0.5 factor becomes 2000.0 here
    because the synthesized ps_availqty is uniform on [1, 9999] while
    the fixture's per-pair annual quantity is sparse (a 0.5 factor
    would pass every pair and the predicate would be dead); 2000.0
    selects ~1/3 of suppliers at both sf0.01 and sf0.1. The threshold is
    rounded deterministically BEFORE the > (Q17 contract). The
    correlated subquery is one keyed aggregate inner-joined back on
    both keys — a pair with no window shipments is excluded, exactly
    the spec's NULL-comparison semantics; the final IN is a semi join
    against the ~100-row supplier dimension."""
    t = load_tables(spark, sf_dir)
    ps = synth_partsupp(t["lineitem"])
    red_parts = t["part"].where(F.col("p_name").like("red%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(round_det(2000.0 * F.sum("l_quantity"), 4).alias("qty_threshold"))
    )
    excess = (
        ps.join(red_parts, F.col("p_partkey") == F.col("ps_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .where(F.col("ps_availqty") > F.col("qty_threshold"))
        .select("ps_suppkey")
    )
    return t["supplier"].join(
        excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")
