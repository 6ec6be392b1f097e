"""EXT queries: training-data pipeline operators over `documents`.

Each Spark builder mirrors its DuckDB oracle expression-for-expression
(same md5-prefix hash, same rounding, same regex patterns) so the
driver's value-hash gate checks real cross-engine semantics, not a
self-fulfilling reimplementation. No reference analog (the reference's
ETL is GitHub-shaped); these fulfil the EXT north-star mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import sql_round
from ..functions.text import EMAIL_RE, PHONE_RE, redact_pii_expr
from ..operators.pipeline import (
    hash_split,
    repetition_metrics,
    sql_hash_bucket,
    stratified_sample,
)
from ..tables import load_tables
from .ext import _SQL_WORDS
from .registry import query


@query(
    "text_repetition",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                    i -> array_to_string(w[i:i+1], ' '))) AS g
      FROM toks
    ),
    cnt AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           {sql_round('MAX(c) / CAST(SUM(c) AS DOUBLE)', 4)} AS top_gram_frac,
           {sql_round('SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(SUM(c) AS DOUBLE)', 4)} AS dup_gram_frac
    FROM cnt GROUP BY doc_id
    """,
    headline=True,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: Gopher-style within-document repetition quality signals
    (top-bigram fraction, duplicate-bigram fraction). Distributed
    explode + two keyed partial aggs — O(tokens), never O(len²)/row."""
    t = load_tables(spark, sf_dir)
    return repetition_metrics(t["documents"], "text", "doc_id", n=2)


@query(
    "split_hash_assign",
    oracle=f"""
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {sql_hash_bucket('doc_id')} AS bucket FROM documents)
    """,
)
def split_hash_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: deterministic 80/10/10 train/val/test assignment from a
    portable md5-prefix bucket — stable across engines, runs and
    cluster sizes; zero-shuffle per-row expression."""
    t = load_tables(spark, sf_dir)
    return hash_split(t["documents"], "doc_id").select("doc_id", "bucket", "split")


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ) WHERE rn <= ceil(n * 0.1)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: exact deterministic 10% stratified sample per language —
    ceil(n·frac) rows per stratum in portable-hash order (reproducible,
    unlike Bernoulli sampleBy)."""
    t = load_tables(spark, sf_dir)
    return stratified_sample(t["documents"], ["lang"], 0.1, "doc_id").select(
        "doc_id", "lang", "source"
    )


@query(
    "pii_redact",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             concat('reach user', CAST(doc_id AS VARCHAR),
                    '@example.com or +1-555-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                    ' re ', substr(text, 1, 40)) AS contact
      FROM documents)
    SELECT doc_id, contact,
           regexp_replace(
             regexp_replace(contact, '{EMAIL_RE}', '[EMAIL]', 'g'),
             '{PHONE_RE}', '[PHONE]', 'g') AS redacted
    FROM c
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: regex PII redaction (emails then phones, typed
    placeholders). The fixture corpus carries no PII, so the query
    synthesizes a deterministic contact string per document and redacts
    it — the oracle proves pattern parity on every row."""
    t = load_tables(spark, sf_dir)
    contact = F.concat(
        F.lit("reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" re "),
        F.substring(F.col("text"), 1, 40),
    )
    return t["documents"].select(
        "doc_id",
        contact.alias("contact"),
        redact_pii_expr(contact).alias("redacted"),
    )
