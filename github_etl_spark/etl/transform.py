"""The reference's `transform_data` re-expressed as Catalyst plans.

Reference: `main.py:426-549` — one monolithic row-at-a-time Python
function turning enriched PR dicts into four flat tables. Here each
output table is a declarative DataFrame plan over a single nested
input DataFrame, so Catalyst sees every projection/filter/explode and
the whole transform runs JVM-side with whole-stage codegen — no Python
in the hot path.

Scale notes (100 TB):
- Everything except the input scan is per-row (projections, explodes,
  higher-order array functions). There is **zero shuffle** in the whole
  transform — even the reference's "earliest approval" aggregation
  (main.py:513-518) is computed inside the row with
  `array_min(transform(filter(...)))` because the reviews are already
  grafted onto their PR; no groupBy needed.
- The comments→reviews status lookup (main.py:494-539) is likewise
  row-local: the reference scopes its `review_id_statuses` dict to one
  PR, and both arrays live in the same row, so `map_from_arrays` +
  `element_at` replaces a join entirely.
- Output row counts fan out only through `explode` (commits = PR ×
  commit × file), which parallelizes with the input partitioning.

Deliberate divergences from the reference (documented, SURVEY.md §7.4):
- Timestamps are parsed to `TimestampType` at this boundary; the
  reference passes ISO-8601 strings through and compares them
  lexicographically (main.py:517) — chronologically equivalent for the
  uniform UTC-"Z" strings GitHub emits.
- PRs with a NULL `number` are dropped entirely (F3). The reference
  leaves them in the batch un-enriched, which would `KeyError` at
  main.py:474 — a latent crash, not a behavior to preserve.
- A missing/NULL child array is treated as empty instead of raising.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import bug_id_expr

# --------------------------------------------------------------------------
# Ingest schema: the enriched-PR document (GitHub API shape + the three
# child arrays the extractor grafts on — reference main.py:231-239; the
# raw nested shape is pinned by the reference's mock,
# mock_github_api.py:45-96).
# --------------------------------------------------------------------------

_LABEL = T.StructType([T.StructField("name", T.StringType())])

_COMMIT_FILE = T.StructType(
    [
        T.StructField("filename", T.StringType()),
        T.StructField("additions", T.LongType()),
        T.StructField("deletions", T.LongType()),
    ]
)

_COMMIT = T.StructType(
    [
        T.StructField("sha", T.StringType()),
        T.StructField(
            "commit",
            T.StructType(
                [
                    T.StructField(
                        "author",
                        T.StructType(
                            [
                                T.StructField("name", T.StringType()),
                                T.StructField("date", T.StringType()),
                            ]
                        ),
                    )
                ]
            ),
        ),
        T.StructField("files", T.ArrayType(_COMMIT_FILE)),
    ]
)

_USER = T.StructType([T.StructField("login", T.StringType())])

_REVIEW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("user", _USER),
        T.StructField("state", T.StringType()),
        T.StructField("submitted_at", T.StringType()),
    ]
)

_COMMENT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("user", _USER),
        T.StructField("body", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("pull_request_review_id", T.LongType()),
    ]
)

RAW_PR_SCHEMA = T.StructType(
    [
        T.StructField("number", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("updated_at", T.StringType()),
        T.StructField("merged_at", T.StringType()),
        T.StructField("labels", T.ArrayType(_LABEL)),
        T.StructField("commit_data", T.ArrayType(_COMMIT)),
        T.StructField("reviewer_data", T.ArrayType(_REVIEW)),
        T.StructField("comment_data", T.ArrayType(_COMMENT)),
    ]
)

TABLE_ORDER = ("pull_requests", "commits", "reviewers", "comments")


def raw_prs_df(spark: SparkSession, prs: list[dict]) -> DataFrame:
    """Enriched-PR dicts → nested DataFrame (connector/test helper)."""
    return spark.createDataFrame(prs, RAW_PR_SCHEMA)


def _ts(col) -> F.Column:
    """ISO-8601 string → timestamp (boundary parse; §7.4 risk 1).

    try_to_timestamp, not to_timestamp: under Spark 4's default ANSI
    mode a malformed string would otherwise throw and kill the whole
    batch — a bad row must degrade to NULL, same stance as bug_id's
    try_cast."""
    return F.try_to_timestamp(col)


def pull_requests_table(prs: DataFrame, repo: str) -> DataFrame:
    """`pull_requests` (reference main.py:445-470,513-518; data.yml:6-28).

    `date_approved` = earliest APPROVED review — computed row-locally
    over the grafted `reviewer_data` array: filter state, take min
    submitted_at. `array_min` skips NULL entries, matching the
    reference's None-guard (main.py:515-517).
    """
    approved = F.filter(
        F.col("reviewer_data"), lambda r: r["state"] == F.lit("APPROVED")
    )
    labels = F.coalesce(
        F.transform(F.col("labels"), lambda l: l["name"]),
        F.array().cast("array<string>"),
    )
    return prs.filter(F.col("number").isNotNull()).select(
        F.col("number").alias("pull_request_id"),
        F.col("state").alias("current_status"),
        _ts("created_at").alias("date_created"),
        _ts("updated_at").alias("date_modified"),
        F.lit(repo).alias("target_repository"),
        bug_id_expr(F.coalesce(F.col("title"), F.lit(""))).alias("bug_id"),
        _ts("merged_at").alias("date_landed"),
        F.array_min(F.transform(approved, lambda r: _ts(r["submitted_at"]))).alias(
            "date_approved"
        ),
        labels.alias("labels"),
    )


def commits_table(prs: DataFrame, repo: str) -> DataFrame:
    """`commits` — one row per (commit × file), the double flatten
    (reference main.py:474-491; data.yml:29-50). Two Generate operators;
    null-safe struct access replaces the `.get()` chains."""
    return (
        prs.filter(F.col("number").isNotNull())
        .select(
            F.col("number").alias("pull_request_id"),
            F.explode(F.coalesce(F.col("commit_data"), F.array())).alias("c"),
        )
        .select(
            "pull_request_id",
            F.lit(repo).alias("target_repository"),
            F.col("c.sha").alias("commit_sha"),
            _ts(F.col("c.commit.author.date")).alias("date_created"),
            F.col("c.commit.author.name").alias("author_username"),
            F.lit(None).cast("string").alias("author_email"),
            F.explode(F.coalesce(F.col("c.files"), F.array())).alias("f"),
        )
        .select(
            "pull_request_id",
            "target_repository",
            "commit_sha",
            "date_created",
            "author_username",
            "author_email",
            F.col("f.filename").alias("filename"),
            F.col("f.deletions").alias("lines_removed"),
            F.col("f.additions").alias("lines_added"),
        )
    )


def reviewers_table(prs: DataFrame, repo: str) -> DataFrame:
    """`reviewers` — one row per review (reference main.py:496-509;
    data.yml:51-66). `user` may be NULL upstream of the extractor's
    filter; null-safe access mirrors `(review.get("user") or {})`."""
    return (
        prs.filter(F.col("number").isNotNull())
        .select(
            F.col("number").alias("pull_request_id"),
            F.explode(F.coalesce(F.col("reviewer_data"), F.array())).alias("r"),
        )
        .select(
            "pull_request_id",
            F.lit(repo).alias("target_repository"),
            _ts(F.col("r.submitted_at")).alias("date_reviewed"),
            F.lit(None).cast("string").alias("reviewer_email"),
            F.col("r.user.login").alias("reviewer_username"),
            F.col("r.state").alias("status"),
        )
    )


def comments_table(prs: DataFrame, repo: str) -> DataFrame:
    """`comments` with the review-status lookup (reference
    main.py:494-499,522-541; data.yml:67-86).

    The reference builds a per-PR dict `review_id → state` and probes it
    per comment (J3). Both arrays live in the same row here, so the
    lookup is a row-local array filter — no join, no shuffle, scoped to
    the PR exactly like the dict. The LAST matching review wins,
    mirroring the dict's overwrite-on-duplicate-id behavior (a
    map_from_arrays lookup would THROW on a duplicated review id under
    the default dedup policy — a malformed row must degrade, not kill
    the job). Unmatched or NULL FK → NULL status.

    `character_count`: `len(body) if body else 0` → NULL body and empty
    body both give 0 (C2).
    """
    matches = F.filter(
        F.coalesce(F.col("reviewer_data"), F.array()),
        lambda r: r["id"] == F.col("cm.pull_request_review_id"),
    )
    status = F.try_element_at(matches, F.lit(-1))["state"]
    return (
        prs.filter(F.col("number").isNotNull())
        .select(
            F.col("number").alias("pull_request_id"),
            F.col("reviewer_data"),
            F.explode(F.coalesce(F.col("comment_data"), F.array())).alias("cm"),
        )
        .select(
            "pull_request_id",
            F.lit(repo).alias("target_repository"),
            F.col("cm.id").alias("comment_id"),
            _ts(F.col("cm.created_at")).alias("date_created"),
            F.lit(None).cast("string").alias("author_email"),
            F.col("cm.user.login").alias("author_username"),
            F.coalesce(F.length("cm.body"), F.lit(0)).cast("long").alias(
                "character_count"
            ),
            status.alias("status"),
        )
    )


def transform(prs: DataFrame, repo: str) -> dict[str, DataFrame]:
    """All four output tables from one enriched-PR DataFrame.

    Returns un-stamped tables; the snapshot sink adds
    `snapshot_date` (`sinks.snapshot.stamp`) — same split as the
    reference (transform stamps repo, load stamps date).
    """
    return {
        "pull_requests": pull_requests_table(prs, repo),
        "commits": commits_table(prs, repo),
        "reviewers": reviewers_table(prs, repo),
        "comments": comments_table(prs, repo),
    }
