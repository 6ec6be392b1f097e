"""Local mirror of the driver's correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet fixture dir, then compares row count + column names +
order-insensitive values. Used by tests/test_queries.py at sf0.001 for
fast iteration (the driver runs sf0.01).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert spark result == duckdb result (order-insensitive)."""
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    # Sort columns by name (driver contract), then rows.
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    # Sort by repr: rows may mix None/str/num which don't compare directly.
    s_sorted = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in spark_rows), key=repr
    )
    d_sorted = sorted(
        (tuple(_norm(r[i]) for i in d_idx) for r in duck_rows), key=repr
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[:3]}"
