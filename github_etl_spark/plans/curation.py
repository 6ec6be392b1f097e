"""EXT queries: the canonical web-corpus curation recipes (C4, Gopher,
CCNet) over `documents` — see operators/curation.py for the recipe
citations, the derived-line rendering contract, and the scale shapes.

Each oracle replays the derivation and every rule expression-for-
expression (same positional line decoration, same md5 span keys, same
floor-rounding), so the driver's value-hash gate checks the whole
recipe cross-engine. The oracles deliberately use the NAIVE spec form
(window-ranked span occurrences, plain joins); the engine side uses
the scale shapes (partial-aggregated span keeper, broadcast cut
points) — value equality between the two shapes is the check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.rounding import sql_round
from ..tables import load_tables
from .ext import _SQL_STOPS_EN, _SQL_WORDS
from .registry import query

# The derived-line rendering (operators/curation.derived_lines_expr)
# as DuckDB SQL over a CTE exposing `ws` (the word array). Constants
# mirror curation.LINE_WORDS / BULLET_MOD / BOILER_MOD / ELLIPSIS_MOD
# / NOPUNCT_MOD — change one, change both.
_SQL_LINES = """
    list_transform(range(CAST(ceil(len(ws)/6.0) AS BIGINT)), j ->
      (CASE WHEN j % 5 = 0 THEN '- ' ELSE '' END)
      || array_to_string(ws[(j*6+1):(j*6+6)], ' ')
      || (CASE WHEN j % 11 = 5 THEN ' javascript' ELSE '' END)
      || (CASE WHEN j % 7 = 3 THEN '...'
               WHEN j % 3 <> 2 THEN '.' ELSE '' END))
"""

# C4 §2.2 line-retention predicate over one derived line `l`.
_SQL_C4_KEEP = """
      regexp_matches(l, '[.!?]$')
      AND len(list_filter(string_split(l, ' '),
              t -> regexp_matches(t, '[a-z]'))) >= 5
      AND NOT contains(l, 'javascript')
      AND NOT contains(l, 'lorem ipsum')
      AND NOT contains(l, '{')
"""


@query(
    "c4_clean",
    headline=True,
    oracle=f"""
    WITH w AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
    lines AS (SELECT doc_id, {_SQL_LINES} AS lns FROM w),
    kl AS (
      SELECT doc_id, CAST(len(lns) AS INTEGER) AS n_lines,
             list_filter(lns, l -> {_SQL_C4_KEEP}) AS kept
      FROM lines
    ),
    spans AS (
      SELECT doc_id, CAST(j AS INTEGER) AS pos,
             md5(array_to_string(kept[(j+1):(j+3)], chr(1))) AS span_key
      FROM kl, unnest(range(len(kept) - 2)) AS t(j)
      WHERE len(kept) >= 3
    ),
    marked AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY span_key
                                ORDER BY doc_id, pos) AS rn
      FROM spans
    ),
    dups AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(count(*) FILTER (rn > 1) AS BIGINT) AS n_dup_spans
      FROM marked GROUP BY doc_id
    )
    SELECT kl.doc_id, kl.n_lines,
           CAST(len(kept) AS INTEGER) AS n_kept,
           len(kept) >= 3 AS keep_doc,
           COALESCE(d.n_spans, 0) AS n_spans,
           COALESCE(d.n_dup_spans, 0) AS n_dup_spans
    FROM kl LEFT JOIN dups d ON kl.doc_id = d.doc_id
    """,
)
def c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: C4 cleaning (Raffel et al. 2020 §2.2) — line-retention
    rules plus the corpus-wide three-sentence-span dedup, summarized
    per document (operators/curation.c4_clean). The oracle ranks span
    occurrences with the naive window spec; the engine uses a
    partial-aggregated min-struct keeper + span-keyed join so a
    corpus-hot boilerplate span can never funnel through one task."""
    from ..operators.curation import c4_clean as op

    t = load_tables(spark, sf_dir)
    return op(t["documents"], "text", "doc_id")


@query(
    "gopher_quality_gate",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
    feat AS (
      SELECT doc_id, ws, {_SQL_LINES} AS lns,
             array_to_string({_SQL_LINES}, chr(10)) AS r,
             CAST(len(ws) AS INTEGER) AS n_words
      FROM w
    ),
    m AS (
      SELECT doc_id, n_words,
        {sql_round("COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)"
                   " / CAST(greatest(n_words, 1) AS DOUBLE)", 4)} AS mean_word_len,
        {sql_round("((length(r) - length(replace(r, '#', '')))"
                   " + (length(r) - length(replace(r, '...', ''))) / 3.0)"
                   " / CAST(greatest(n_words, 1) AS DOUBLE)", 4)} AS symbol_ratio,
        {sql_round("CAST(len(list_filter(lns, l -> l LIKE '- %')) AS DOUBLE)"
                   " / CAST(greatest(len(lns), 1) AS DOUBLE)", 4)} AS bullet_frac,
        {sql_round("CAST(len(list_filter(lns, l -> l LIKE '%...')) AS DOUBLE)"
                   " / CAST(greatest(len(lns), 1) AS DOUBLE)", 4)} AS ellipsis_frac,
        {sql_round("CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)"
                   " / CAST(greatest(n_words, 1) AS DOUBLE)", 4)} AS alpha_frac,
        CAST(len(list_distinct(list_filter(ws,
             x -> list_contains({_SQL_STOPS_EN}, x)))) AS INTEGER)
          AS n_stop_distinct
      FROM feat
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
           ellipsis_frac, alpha_frac, n_stop_distinct,
           (n_words >= 50 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio <= 0.1
            AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
            AND alpha_frac >= 0.8 AND n_stop_distinct >= 2) AS keep
    FROM m
    """,
)
def gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: Gopher quality rules (Rae et al. 2021, Table A1) as one
    map-only gate (operators/curation.gopher_gate): word-count and
    mean-word-length bounds, symbol-to-word ratio, bullet/ellipsis
    line fractions over the derived rendering, alphabetic-word
    fraction, stopword presence. Zero exchanges; `keep` is the
    conjunction a production pipeline filters on."""
    from ..operators.curation import gopher_gate

    t = load_tables(spark, sf_dir)
    return gopher_gate(t["documents"], "text", "doc_id")


@query(
    "ccnet_perplexity_buckets",
    headline=True,
    oracle=f"""
    WITH w AS (SELECT doc_id, lang, {_SQL_WORDS} AS ws FROM documents),
    toks AS (SELECT doc_id, lang, unnest(ws) AS tok FROM w),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    n AS (SELECT count(*) AS n FROM toks),
    scored AS (
      SELECT doc_id, lang,
             {sql_round("avg(ln(c / CAST(n.n AS DOUBLE)))", 4)} AS avg_logprob
      FROM toks JOIN freq USING (tok) CROSS JOIN n
      GROUP BY doc_id, lang
    ),
    cuts AS (
      SELECT lang,
             {sql_round("quantile_cont(avg_logprob, 1.0/3.0)", 4)} AS c33,
             {sql_round("quantile_cont(avg_logprob, 2.0/3.0)", 4)} AS c66
      FROM scored GROUP BY lang
    )
    SELECT doc_id, lang, avg_logprob,
           CASE WHEN avg_logprob > c66 THEN 'head'
                WHEN avg_logprob > c33 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored JOIN cuts USING (lang)
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: CCNet head/middle/tail bucketing (Wenzek et al. 2020) —
    per-language split at the 33rd/66th percentile of the document's
    corpus-self unigram LM score (operators/curation.ccnet_buckets;
    LM rule shared with text_unigram_logprob). Cut points are one
    per-language exact-percentile aggregate broadcast back; no global
    window, no per-language sort."""
    from ..operators.curation import ccnet_buckets

    t = load_tables(spark, sf_dir)
    return ccnet_buckets(t["documents"], "text", "doc_id", "lang")
