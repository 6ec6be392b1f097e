"""Span (substring-level) dedup properties (operators/spans.py).
Span VALUES are oracle-checked by the driver (`span_dedup`); these
tests pin the removal semantics and the hash-grams fast path."""

from __future__ import annotations

from github_etl_spark.operators.spans import (
    duplicated_spans,
    remove_duplicated_spans,
)

BOILER = "this license header is identical across files and must vanish entirely"


def _docs(spark):
    rows = [
        (1, BOILER + " alpha beta gamma delta epsilon zeta"),
        (2, BOILER + " completely different tail content here now"),
        (3, "unique words only nothing repeated in this document at all today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first_removes_later_occurrence_only(spark):
    out = {
        r.doc_id: r
        for r in remove_duplicated_spans(_docs(spark), k=8).collect()
    }
    assert out[1].n_tokens_removed == 0
    assert out[2].n_tokens_removed == len(BOILER.split())
    assert "license" not in out[2].clean_text
    assert "different tail content" in out[2].clean_text
    assert out[3].n_tokens_removed == 0
    assert out[3].clean_text == out[3].text  # rejoin is identity here


def test_keep_first_false_removes_all_occurrences(spark):
    out = {
        r.doc_id: r.n_tokens_removed
        for r in remove_duplicated_spans(
            _docs(spark), k=8, keep_first=False
        ).collect()
    }
    n = len(BOILER.split())
    assert out[1] == n and out[2] == n and out[3] == 0


def test_long_duplicate_run_merges_to_one_span(spark):
    """Consecutive duplicated k-grams must merge into a single maximal
    span, not one span per gram."""
    spans = duplicated_spans(_docs(spark), k=8).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc, []).append((r.span_start, r.span_end))
    assert list(by_doc) == [2]
    assert by_doc[2] == [(0, len(BOILER.split()) - 1)]


def test_hash_grams_matches_string_grams(spark):
    a = sorted(map(tuple, duplicated_spans(_docs(spark), k=8, hash_grams=False).collect()))
    b = sorted(map(tuple, duplicated_spans(_docs(spark), k=8, hash_grams=True).collect()))
    assert a == b


def test_within_doc_repetition_is_caught(spark):
    """A document repeating its own 8-gram gets the second occurrence
    flagged even with keep_first (first copy survives)."""
    phrase = "repeat me once repeat me twice over the fence again friend"
    docs = spark.createDataFrame(
        [(1, phrase + " filler filler " + phrase)], "doc_id long, text string"
    )
    out = remove_duplicated_spans(docs, k=8).head()
    assert 0 < out.n_tokens_removed <= len(phrase.split())
    assert out.clean_text.startswith(phrase)
