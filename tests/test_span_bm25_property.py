"""Differential property tests for span dedup and BM25.

Independent pure-Python re-implementations are the ground truth;
hypothesis builds random small corpora from a tiny vocabulary (high
collision probability → duplicated grams and shared terms appear
often) and each example runs ONE Spark roundtrip over the whole
corpus — same harness shape as test_text_property.
"""

from __future__ import annotations

import math
import re

from hypothesis import given, settings, strategies as st

from github_etl_spark.operators.search import bm25_topk
from github_etl_spark.operators.spans import duplicated_spans

VOCAB = ["ant", "bee", "cat", "dog", "elk", "fox"]

doc_strategy = st.lists(
    st.sampled_from(VOCAB), min_size=0, max_size=14
).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=8)


def ref_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def ref_spans(corpus: list[str], k: int, keep_first: bool):
    """Reference replay of duplicated_spans: gram occurrence ranking in
    (doc, pos) order, keep-first exemption, maximal overlap merge."""
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, text in enumerate(corpus):
        toks = ref_tokens(text)
        for p in range(len(toks) - k + 1):
            occ.setdefault(" ".join(toks[p : p + k]), []).append((d, p))
    flagged: dict[int, list[int]] = {}
    for positions in occ.values():
        if len(positions) <= 1:
            continue
        ordered = sorted(positions)
        for d, p in ordered[1:] if keep_first else ordered:
            flagged.setdefault(d, []).append(p)
    out = set()
    for d, ps in flagged.items():
        ps.sort()
        start, end = ps[0], ps[0] + k - 1
        for p in ps[1:]:
            if p > end:
                out.add((d, start, end, end - start + 1))
                start, end = p, p + k - 1
            else:
                end = max(end, p + k - 1)
        out.add((d, start, end, end - start + 1))
    return out


@settings(max_examples=25, deadline=None)
@given(corpus=corpus_strategy, k=st.integers(2, 4), keep=st.booleans())
def test_duplicated_spans_matches_reference(spark, corpus, k, keep):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        (r.doc, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(
            df, k=k, keep_first=keep, hash_grams=False
        ).collect()
    }
    assert got == ref_spans(corpus, k, keep)


def ref_bm25(corpus: list[str], terms: list[str], k1=1.2, b=0.75):
    toks = [ref_tokens(t) for t in corpus]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    tf: dict[tuple[int, str], int] = {}
    for d, ts in enumerate(toks):
        for t in ts:
            if t in terms:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df_t: dict[str, int] = {}
    for (d, t) in tf:
        df_t[t] = df_t.get(t, 0) + 1
    scores: dict[int, float] = {}
    for (d, t), f in tf.items():
        idf = math.log(1.0 + (n - df_t[t] + 0.5) / (df_t[t] + 0.5))
        part = (f * (k1 + 1.0)) / (
            f + k1 * (1.0 - b + b * len(toks[d]) / avgdl)
        )
        scores[d] = scores.get(d, 0.0) + idf * part
    return {
        d: math.floor(s * 10000 + 0.5) / 10000 for d, s in scores.items()
    }


@settings(max_examples=25, deadline=None)
@given(corpus=corpus_strategy, terms=st.sets(st.sampled_from(VOCAB), min_size=1, max_size=3))
def test_bm25_scores_match_reference(spark, corpus, terms):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.score
        for r in bm25_topk(df, sorted(terms), k=len(corpus)).collect()
    }
    assert got == ref_bm25(corpus, sorted(terms))
