"""Malformed-payload-tolerant JSON parsing.

The reference engine consumes REST-API JSON imperatively and skips
records with missing keys one `if` at a time (reference/main.py:228-230,
335,369); at pipeline scale the same concern is handled declaratively:
parse with an explicit schema, CAPTURE rows that do not conform
instead of either crashing the job (one bad byte in 100 TB) or
silently dropping them (unauditable data loss). The corrupt rows land
in a side column/table for quarantine + replay — the standard
"dead-letter" pattern.

`from_json` is JVM-side (Jackson under codegen); no Python in the row
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def parse_json_quarantine(
    df: DataFrame, col: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Parse ``df[col]`` as JSON with ``schema``; return
    ``(parsed, quarantined)``.

    - ``parsed``: rows whose payload conformed, with struct fields of
      ``schema`` appended (NULL payloads conform vacuously and stay in
      ``parsed`` with NULL fields — absence is not corruption).
    - ``quarantined``: the original rows whose payload did NOT parse,
      with the raw payload preserved under ``_corrupt_record`` for
      audit/replay.

    PERMISSIVE mode with an explicit corrupt-record column is the only
    mode that is safe at scale: FAILFAST kills a 1000-executor job for
    one bad byte, DROPMALFORMED erases data with no audit trail.

    Schema field names must be disjoint from ``df``'s columns (the
    parsed struct is star-expanded next to them — a collision would
    silently produce duplicate output columns) and must not include
    ``_corrupt_record`` (reserved for the quarantine split).
    """
    spark = df.sparkSession
    probe = spark.range(0).select(
        F.from_json(F.lit(None).cast("string"), schema).alias("__s")
    )
    fields = set(probe.schema["__s"].dataType.fieldNames())
    # Name comparison must follow the session's resolution rules:
    # under the default spark.sql.caseSensitive=false, 'K' and 'k'
    # collide too (AMBIGUOUS_REFERENCE downstream).
    case_sensitive = (
        str(spark.conf.get("spark.sql.caseSensitive", "false")).lower() == "true"
    )
    canon = (lambda n: n) if case_sensitive else str.casefold
    if any(canon(f) == canon(CORRUPT_COL) for f in fields):
        raise ValueError(
            f"schema must not declare the reserved column {CORRUPT_COL!r}; "
            "it is added internally to detect malformed payloads"
        )
    in_cols = {canon(c) for c in df.columns}
    clash = sorted(f for f in fields if canon(f) in in_cols)
    if clash:
        raise ValueError(
            f"schema fields {clash} collide with input columns; rename them "
            "in the schema or drop/rename the input columns first "
            "(star-expansion would otherwise emit duplicate column names)"
        )
    full_schema = f"{schema}, {CORRUPT_COL} string"
    parsed = df.withColumn(
        "__j",
        F.from_json(
            F.col(col),
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    ok = parsed.where(F.col(f"__j.{CORRUPT_COL}").isNull()).select(
        "*", "__j.*"
    ).drop("__j", CORRUPT_COL)
    bad = parsed.where(F.col(f"__j.{CORRUPT_COL}").isNotNull()).select(
        *df.columns, F.col(f"__j.{CORRUPT_COL}").alias(CORRUPT_COL)
    )
    return ok, bad


def json_conformance_rate(df: DataFrame, col: str, schema: str) -> Column:
    """Aggregate Column: fraction of non-NULL payloads that parse under
    ``schema`` — the ingest-health metric to `observe()` per batch."""
    # PERMISSIVE from_json yields an all-NULL struct (not NULL) for
    # malformed input, so .isNotNull() on the struct can't detect
    # corruption — the corrupt-record field can.
    parsed = F.from_json(
        F.col(col),
        f"{schema}, {CORRUPT_COL} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    ok = parsed.getField(CORRUPT_COL).isNull() & F.col(col).isNotNull()
    return (
        F.sum(F.when(ok, 1).otherwise(0))
        / F.sum(F.when(F.col(col).isNotNull(), 1).otherwise(0))
    ).alias("json_conformance_rate")
