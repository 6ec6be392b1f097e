"""Differential property tests for the text-analysis expressions.

Independent Python re-implementations are the ground truth; hypothesis
builds adversarial texts (unicode, punctuation runs, stopword salads)
and each example batches many texts through ONE Spark roundtrip —
same harness shape as test_bug_id_property.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from github_etl_spark.functions.text import (
    DE_STOPWORDS,
    EN_STOPWORDS,
    ES_STOPWORDS,
    bpe_ish_piece_count_expr,
    lang_id_expr,
    punct_ratio_expr,
    token_count_expr,
)


def ref_words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w != ""]


def ref_token_count(text: str) -> int:
    return len(ref_words(text))


def ref_piece_count(text: str) -> int:
    return len(re.findall(r"[a-z0-9]+|[^a-z0-9\s]", text.lower()))


def ref_punct_ratio(text: str) -> float:
    n_punct = sum(1 for ch in text if ch in ".!?,;:")
    return n_punct / max(len(text), 1)


def _hits(text: str, stops) -> int:
    return sum(1 for w in ref_words(text) if w in stops)


def ref_lang(text: str) -> str:
    en, es, de = (_hits(text, s) for s in (EN_STOPWORDS, ES_STOPWORDS, DE_STOPWORDS))
    if en >= es and en >= de and en > 0:
        return "en"
    if es >= de and es > 0:
        return "es"
    if de > 0:
        return "de"
    return "und"


_word = st.one_of(
    st.sampled_from(
        list(EN_STOPWORDS) + list(ES_STOPWORDS) + list(DE_STOPWORDS)
        + ["widget", "x9", "...", "!!", "a.b,c", "ümlaut", "naïve", "0", ""]
    ),
    st.text(alphabet="abc .!?,;:\t\n0189é", min_size=0, max_size=8),
)
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_text, min_size=1, max_size=60))
def test_text_metrics_match_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r.i: r
        for r in df.select(
            "i",
            token_count_expr(F.col("text")).alias("tokens"),
            bpe_ish_piece_count_expr(F.col("text")).alias("pieces"),
            punct_ratio_expr(F.col("text")).alias("punct"),
            lang_id_expr(F.col("text")).alias("lang"),
        ).collect()
    }
    for i, t in enumerate(texts):
        r = got[i]
        assert r.tokens == ref_token_count(t), (t, r.tokens)
        assert r.pieces == ref_piece_count(t), (t, r.pieces)
        assert abs(r.punct - ref_punct_ratio(t)) < 1e-9, (t, r.punct)
        assert r.lang == ref_lang(t), (t, r.lang)
