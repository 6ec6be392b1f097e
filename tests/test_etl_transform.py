"""Golden tests for etl/transform.py — the reference's behavioral spec
(reference tests/test_transform_data.py) re-asserted against the
DataFrame implementation. Cases re-derived from reference semantics,
not copied.
"""

from __future__ import annotations

import datetime as dt

import pytest

from github_etl_spark.etl.transform import (
    raw_prs_df,
    transform,
)

REPO = "acme/widgets"


def _pr(number=1, **over):
    base = {
        "number": number,
        "title": f"Fix widget {number}",
        "state": "open",
        "created_at": "2026-01-01T10:00:00Z",
        "updated_at": "2026-01-02T11:00:00Z",
        "merged_at": None,
        "labels": [],
        "commit_data": [],
        "reviewer_data": [],
        "comment_data": [],
    }
    base.update(over)
    return base


def _tables(spark, prs):
    return {k: v.collect() for k, v in transform(raw_prs_df(spark, prs), REPO).items()}


# ---------------------------------------------------------------- pull_requests


def test_pr_field_mapping(spark):
    out = _tables(spark, [_pr(merged_at="2026-01-03T12:00:00Z")])
    [row] = out["pull_requests"]
    assert row.pull_request_id == 1
    assert row.current_status == "open"
    assert row.target_repository == REPO
    assert row.date_created == dt.datetime(2026, 1, 1, 10, 0)
    assert row.date_modified == dt.datetime(2026, 1, 2, 11, 0)
    assert row.date_landed == dt.datetime(2026, 1, 3, 12, 0)
    assert row.date_approved is None
    assert row.author_email if hasattr(row, "author_email") else True


@pytest.mark.parametrize(
    ("title", "expected"),
    [
        ("Fix bug 123 in parser", 123),
        ("bug 99:", 99),
        ("b=456 regression", 456),
        ("Bug #789 again", 789),
        ("BUG  42 spaced", 42),
        ("Bug 999999999 too big", None),  # >= 1e8 rejected
        ("Bug 999999999 and bug 123", 123),  # first SURVIVING match
        ("no id here", None),
        ("debug 55 is not a bug ref", None),  # \b prefix guard
        ("", None),
    ],
)
def test_bug_id_extraction(spark, title, expected):
    out = _tables(spark, [_pr(title=title)])
    assert out["pull_requests"][0].bug_id == expected


def test_bug_id_null_title(spark):
    out = _tables(spark, [_pr(title=None)])
    assert out["pull_requests"][0].bug_id is None


def test_labels_array_semantics(spark):
    out = _tables(
        spark,
        [
            _pr(1, labels=[{"name": "p1"}, {"name": "crash"}]),
            _pr(2, labels=[]),
            _pr(3, labels=None),
        ],
    )
    by_id = {r.pull_request_id: r.labels for r in out["pull_requests"]}
    assert by_id[1] == ["p1", "crash"]
    assert by_id[2] == []  # empty stays a real empty list
    assert by_id[3] == []  # NULL array → [] (falsy → [] in reference)


def test_date_approved_earliest_approved_only(spark):
    reviews = [
        {"id": 1, "user": {"login": "a"}, "state": "COMMENTED",
         "submitted_at": "2026-01-01T00:00:00Z"},
        {"id": 2, "user": {"login": "b"}, "state": "APPROVED",
         "submitted_at": "2026-01-05T00:00:00Z"},
        {"id": 3, "user": {"login": "c"}, "state": "APPROVED",
         "submitted_at": "2026-01-03T00:00:00Z"},
    ]
    out = _tables(spark, [_pr(reviewer_data=reviews)])
    assert out["pull_requests"][0].date_approved == dt.datetime(2026, 1, 3)


def test_date_approved_none_when_no_approval(spark):
    reviews = [{"id": 1, "user": {"login": "a"}, "state": "CHANGES_REQUESTED",
                "submitted_at": "2026-01-01T00:00:00Z"}]
    out = _tables(spark, [_pr(reviewer_data=reviews)])
    assert out["pull_requests"][0].date_approved is None


def test_missing_number_pr_dropped_everywhere(spark):
    prs = [_pr(1), _pr(None, comment_data=[
        {"id": 9, "user": {"login": "x"}, "body": "hi",
         "created_at": "2026-01-01T00:00:00Z", "pull_request_review_id": None}
    ])]
    out = _tables(spark, prs)
    assert [r.pull_request_id for r in out["pull_requests"]] == [1]
    assert out["comments"] == []


# --------------------------------------------------------------------- commits


def test_commit_double_flatten_counts(spark):
    commits = [
        {
            "sha": "abc",
            "commit": {"author": {"name": "dev1", "date": "2026-01-01T09:00:00Z"}},
            "files": [
                {"filename": "a.py", "additions": 10, "deletions": 2},
                {"filename": "b.py", "additions": 5, "deletions": 0},
            ],
        },
        {
            "sha": "def",
            "commit": {"author": {"name": "dev2", "date": "2026-01-02T09:00:00Z"}},
            "files": [{"filename": "c.py", "additions": 1, "deletions": 1}],
        },
    ]
    out = _tables(spark, [_pr(commit_data=commits)])
    rows = sorted(out["commits"], key=lambda r: (r.commit_sha, r.filename))
    assert len(rows) == 3  # one per (commit × file)
    assert rows[0].commit_sha == "abc"
    assert rows[0].filename == "a.py"
    assert rows[0].lines_added == 10
    assert rows[0].lines_removed == 2
    assert rows[0].author_username == "dev1"
    assert rows[0].author_email is None
    assert rows[0].date_created == dt.datetime(2026, 1, 1, 9, 0)
    assert rows[2].author_username == "dev2"


def test_commit_no_files_no_rows(spark):
    commits = [{"sha": "abc", "commit": {"author": {"name": "d", "date": None}},
                "files": []}]
    out = _tables(spark, [_pr(commit_data=commits)])
    assert out["commits"] == []


def test_commit_null_nested_author(spark):
    commits = [{"sha": "abc", "commit": None,
                "files": [{"filename": "a.py", "additions": 1, "deletions": 0}]}]
    out = _tables(spark, [_pr(commit_data=commits)])
    [row] = out["commits"]
    assert row.author_username is None and row.date_created is None


# ------------------------------------------------------------------- reviewers


def test_reviewers_rows(spark):
    reviews = [
        {"id": 10, "user": {"login": "alice"}, "state": "APPROVED",
         "submitted_at": "2026-01-04T08:00:00Z"},
        {"id": 11, "user": None, "state": "COMMENTED",
         "submitted_at": "2026-01-04T09:00:00Z"},
    ]
    out = _tables(spark, [_pr(reviewer_data=reviews)])
    rows = sorted(out["reviewers"], key=lambda r: r.date_reviewed)
    assert len(rows) == 2
    assert rows[0].reviewer_username == "alice"
    assert rows[0].status == "APPROVED"
    assert rows[0].reviewer_email is None
    assert rows[1].reviewer_username is None  # null user → null login


# -------------------------------------------------------------------- comments


def test_comment_status_join_and_char_count(spark):
    reviews = [
        {"id": 100, "user": {"login": "r"}, "state": "CHANGES_REQUESTED",
         "submitted_at": "2026-01-01T00:00:00Z"},
    ]
    comments = [
        {"id": 1, "user": {"login": "u1"}, "body": "needs work",
         "created_at": "2026-01-01T01:00:00Z", "pull_request_review_id": 100},
        {"id": 2, "user": {"login": "u2"}, "body": None,
         "created_at": "2026-01-01T02:00:00Z", "pull_request_review_id": 999},
        {"id": 3, "user": {"login": "u3"}, "body": "",
         "created_at": "2026-01-01T03:00:00Z", "pull_request_review_id": None},
    ]
    out = _tables(spark, [_pr(reviewer_data=reviews, comment_data=comments)])
    by_id = {r.comment_id: r for r in out["comments"]}
    assert by_id[1].status == "CHANGES_REQUESTED"  # matched review
    assert by_id[2].status is None  # unmatched FK
    assert by_id[3].status is None  # NULL FK
    assert by_id[1].character_count == len("needs work")
    assert by_id[2].character_count == 0  # None body → 0
    assert by_id[3].character_count == 0  # empty body → 0
    assert by_id[1].author_username == "u1"
    assert by_id[1].author_email is None


def test_comment_status_scoped_per_pr(spark):
    # A comment must only match reviews of ITS OWN PR (the reference's
    # dict is rebuilt per PR) — even if another PR has that review id.
    pr1 = _pr(1, reviewer_data=[
        {"id": 500, "user": {"login": "r"}, "state": "APPROVED",
         "submitted_at": "2026-01-01T00:00:00Z"}])
    pr2 = _pr(2, comment_data=[
        {"id": 7, "user": {"login": "u"}, "body": "x",
         "created_at": "2026-01-01T00:00:00Z", "pull_request_review_id": 500}])
    out = _tables(spark, [pr1, pr2])
    [c] = out["comments"]
    assert c.status is None


# ------------------------------------------------------------------ structure


def test_empty_input_gives_four_empty_tables(spark):
    out = _tables(spark, [])
    assert set(out) == {"pull_requests", "commits", "reviewers", "comments"}
    assert all(v == [] for v in out.values())


def test_output_schemas(spark):
    tables = transform(raw_prs_df(spark, [_pr()]), REPO)
    assert [f.name for f in tables["pull_requests"].schema] == [
        "pull_request_id", "current_status", "date_created", "date_modified",
        "target_repository", "bug_id", "date_landed", "date_approved", "labels",
    ]
    assert [f.name for f in tables["commits"].schema] == [
        "pull_request_id", "target_repository", "commit_sha", "date_created",
        "author_username", "author_email", "filename", "lines_removed",
        "lines_added",
    ]
    assert [f.name for f in tables["reviewers"].schema] == [
        "pull_request_id", "target_repository", "date_reviewed",
        "reviewer_email", "reviewer_username", "status",
    ]
    assert [f.name for f in tables["comments"].schema] == [
        "pull_request_id", "target_repository", "comment_id", "date_created",
        "author_email", "author_username", "character_count", "status",
    ]


def test_transform_plan_has_no_shuffle(spark):
    # The whole transform is per-row: any Exchange in the plan is a
    # regression (SURVEY.md §2.10 — decomposed, not re-aggregated).
    tables = transform(raw_prs_df(spark, [_pr()]), REPO)
    for name, df in tables.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"unexpected shuffle in {name}"


def test_malformed_timestamp_degrades_to_null(spark):
    out = _tables(spark, [_pr(created_at="not-a-date", updated_at="")])
    [row] = out["pull_requests"]
    assert row.date_created is None and row.date_modified is None


def test_duplicate_review_ids_last_wins(spark):
    """The reference's dict overwrites on duplicate review ids (last
    wins); a map-based lookup would throw DUPLICATE_MAP_KEY."""
    reviews = [
        {"id": 100, "user": {"login": "a"}, "state": "COMMENTED",
         "submitted_at": "2026-01-01T00:00:00Z"},
        {"id": 100, "user": {"login": "a"}, "state": "APPROVED",
         "submitted_at": "2026-01-02T00:00:00Z"},
    ]
    comments = [
        {"id": 1, "user": {"login": "u"}, "body": "x",
         "created_at": "2026-01-03T00:00:00Z", "pull_request_review_id": 100},
    ]
    out = _tables(spark, [_pr(reviewer_data=reviews, comment_data=comments)])
    assert out["comments"][0].status == "APPROVED"
