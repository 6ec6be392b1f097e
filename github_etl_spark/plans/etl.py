"""The reference's semantic spine as queries (SURVEY.md §7.2).

The flagship query reproduces `transform_data`'s shape
(reference main.py:445-518) over the fixture tables: synthesized title →
regex bug-id extraction (C1), dimension broadcast join, conditional
min-agg (A1), left-outer enrichment (J2/J3), projection+rename (P1) and
constant columns (P3-P5) — all in one Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from .core import bug_id_expr
from .registry import query

FLAGSHIP_ORACLE = """
WITH titled AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate,
         CASE
           WHEN o_orderstatus = 'P' THEN 'Update documentation'
           ELSE 'Bug ' || CAST(o_orderkey + 100000000 AS VARCHAR)
                || ' and b=' || CAST(o_orderkey AS VARCHAR) || ' fix'
         END AS title
  FROM orders
),
approvals AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS date_approved
  FROM lineitem
  WHERE l_returnflag = 'A'
  GROUP BY l_orderkey
)
SELECT t.o_orderkey AS pull_request_id,
       t.o_orderstatus AS current_status,
       CAST(t.o_orderdate AS DATE) AS date_created,
       CAST(list_filter(regexp_extract_all(t.title, '(?i)\\b(?:bug|b=)\\s*#?(\\d+)\\b', 1),
                        x -> TRY_CAST(x AS BIGINT) < 100000000)[1] AS BIGINT) AS bug_id,
       c.c_mktsegment AS segment,
       a.date_approved AS date_approved,
       'acme/widgets' AS target_repository,
       CAST('2026-01-15' AS DATE) AS snapshot_date
FROM titled t
JOIN customer c ON t.o_custkey = c.c_custkey
LEFT JOIN approvals a ON t.o_orderkey = a.l_orderkey
"""


def flagship_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders, lineitem, customer = t["orders"], t["lineitem"], t["customer"]

    title = F.when(F.col("o_orderstatus") == "P", F.lit("Update documentation")).otherwise(
        F.concat(
            F.lit("Bug "),
            (F.col("o_orderkey") + 100000000).cast("string"),
            F.lit(" and b="),
            F.col("o_orderkey").cast("string"),
            F.lit(" fix"),
        )
    )

    # A1: conditional min — aggregate BEFORE the join so the shuffle moves
    # one row per order, not one per lineitem (map-side partial agg).
    approvals = (
        lineitem.filter(F.col("l_returnflag") == "A")
        .groupBy("l_orderkey")
        .agg(F.min(F.col("l_shipdate").cast("date")).alias("date_approved"))
    )

    return (
        orders.withColumn("title", title)
        # dimension join: broadcast — customer is the small side at any SF
        # where it fits the 10MB-10GB executor budget; at 100 TB this stays
        # a broadcast because customer ≪ orders.
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(approvals, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            F.col("o_orderkey").alias("pull_request_id"),
            F.col("o_orderstatus").alias("current_status"),
            F.col("o_orderdate").cast("date").alias("date_created"),
            bug_id_expr(F.col("title")).alias("bug_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("date_approved"),
            F.lit("acme/widgets").alias("target_repository"),
            F.lit("2026-01-15").cast("date").alias("snapshot_date"),
        )
    )


query("flagship_pr_snapshot", oracle=FLAGSHIP_ORACLE, headline=True)(flagship_df)


@query(
    "etl_reviewers_table",
    oracle="""
    SELECT event_id AS review_id,
           user_id AS pull_request_id,
           ts AS date_reviewed,
           CAST(NULL AS VARCHAR) AS reviewer_email,
           'user_' || CAST(user_id AS VARCHAR) AS reviewer_username,
           upper(event_type) AS status,
           'acme/widgets' AS target_repository
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    """,
)
def etl_reviewers_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `reviewers` output table shape (reference main.py:496-509,
    data.yml:51-66): filter + project + constant NULL email + repo tag."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_type").isin("purchase", "signup"))
        .select(
            F.col("event_id").alias("review_id"),
            F.col("user_id").alias("pull_request_id"),
            F.col("ts").alias("date_reviewed"),
            F.lit(None).cast("string").alias("reviewer_email"),
            F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias(
                "reviewer_username"
            ),
            F.upper("event_type").alias("status"),
            F.lit("acme/widgets").alias("target_repository"),
        )
    )


@query(
    "etl_comments_status_join",
    oracle="""
    WITH reviews AS (
      SELECT event_id, upper(event_type) AS status
      FROM events WHERE event_type IN ('purchase', 'signup')
    ),
    comments AS (
      SELECT event_id, user_id, ts,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS review_fk
      FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id AS comment_id,
           c.user_id AS pull_request_id,
           c.ts AS date_created,
           r.status AS status
    FROM comments c
    LEFT JOIN reviews r ON c.review_fk = r.event_id
    """,
)
def etl_comments_status_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The comments→reviews status lookup (reference main.py:494-539):
    build the review-id→state map, left-join comments through it;
    unmatched FK → NULL status. The FK here is synthesized from the JSON
    props column, also exercising C10 inside a join key."""
    t = load_tables(spark, sf_dir)
    events = t["events"]
    reviews = events.filter(F.col("event_type").isin("purchase", "signup")).select(
        F.col("event_id").alias("r_event_id"), F.upper("event_type").alias("status")
    )
    comments = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("comment_id"),
        F.col("user_id").alias("pull_request_id"),
        F.col("ts").alias("date_created"),
        F.get_json_object("props", "$.k").cast("long").alias("review_fk"),
    )
    return (
        comments.join(reviews, F.col("review_fk") == F.col("r_event_id"), "left")
        .select("comment_id", "pull_request_id", "date_created", "status")
    )


@query(
    "etl_commits_flatten_agg",
    oracle="""
    SELECT l_orderkey AS pull_request_id,
           l_suppkey AS commit_author,
           count(*) AS n_files,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS lines_added,
           CAST(SUM(l_linenumber) AS BIGINT) AS lines_removed
    FROM lineitem
    GROUP BY l_orderkey, l_suppkey
    """,
)
def etl_commits_flatten_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The commits-table rollup over the (commit × file) flatten
    (reference main.py:474-491): per (PR, author) file counts and line
    sums — the aggregation a consumer of the reference's `commits` table
    would run first."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy(
            F.col("l_orderkey").alias("pull_request_id"),
            F.col("l_suppkey").alias("commit_author"),
        )
        .agg(
            F.count("*").alias("n_files"),
            F.sum(F.col("l_quantity").cast("long")).alias("lines_added"),
            F.sum("l_linenumber").cast("long").alias("lines_removed"),
        )
    )
