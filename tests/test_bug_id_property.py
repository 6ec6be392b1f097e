"""Differential property test for the C1 bug-id extraction.

Ground truth is an independent Python re-implementation of the
reference's semantics (main.py:25,449-454): case-insensitive
`\\b(?:bug|b=)\\s*#?(\\d+)\\b` over the title, drop matches ≥ 1e8,
keep the FIRST survivor, else NULL. Hypothesis builds adversarial
titles; each example batches many titles through ONE Spark roundtrip.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from github_etl_spark.functions.text import bug_id_expr

_REF_RE = re.compile(r"\b(?:bug|b=)\s*#?(\d+)\b", re.IGNORECASE)


def reference_bug_id(title: str | None) -> int | None:
    if title is None:
        return None
    for m in _REF_RE.finditer(title):
        if int(m.group(1)) < 100000000:
            return int(m.group(1))
    return None


# Title fragments biased toward the tricky cases: prefix words that
# embed "bug"/"b=", huge ids, #-forms, spacing, punctuation boundaries.
_fragment = st.one_of(
    st.sampled_from(
        [
            "bug", "Bug", "BUG", "b=", "B=", "#", "debug", "bugs", "ab=",
            "fix", "the", ":", ".", ",", "(", ")", "-", "_", "99999999",
            "100000000", "999999999", "0", "07", "12345678901234567890",
        ]
    ),
    st.integers(min_value=0, max_value=10**10).map(str),
    st.text(alphabet="abz= #0123456789", min_size=0, max_size=6),
)
_title = st.lists(_fragment, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=12, deadline=None)
@given(st.lists(_title, min_size=1, max_size=80))
def test_bug_id_matches_reference_semantics(spark, titles):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(titles)], "i long, title string")
    got = {
        r.i: r.bug_id
        for r in df.select("i", bug_id_expr(F.col("title")).alias("bug_id")).collect()
    }
    for i, t in enumerate(titles):
        assert got[i] == reference_bug_id(t), (t, got[i], reference_bug_id(t))


def test_bug_id_known_edges(spark):
    cases = [
        ("Bug 999999999 and bug 123", 123),  # first SURVIVING match
        ("bug 99999999", 99999999),  # boundary: < 1e8 accepted
        ("bug 100000000", None),  # boundary: == 1e8 rejected
        ("b=#42", 42),  # both prefix and # forms
        ("BUG  #7:", 7),  # spacing + trailing punctuation
        ("debug 55", None),  # \b prefix guard
        ("bug12", 12),  # \s* allows zero spaces
        ("bug #", None),  # no digits
        ("ab=9", None),  # \b guard before b=
    ]
    df = spark.createDataFrame(cases, "title string, expected long")
    rows = df.select(
        "title", "expected", bug_id_expr(F.col("title")).alias("got")
    ).collect()
    for r in rows:
        assert r.got == r.expected, (r.title, r.got, r.expected)
        assert r.got == reference_bug_id(r.title)  # ground truth agrees
