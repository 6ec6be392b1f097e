"""ETL layer: the reference pipeline's transform re-expressed on Spark."""

from .transform import (  # noqa: F401
    RAW_PR_SCHEMA,
    TABLE_ORDER,
    comments_table,
    commits_table,
    pull_requests_table,
    raw_prs_df,
    reviewers_table,
    transform,
)
