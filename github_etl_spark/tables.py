"""Fixture-table catalog.

The driver's synthetic star schema (TESTDATA.md) is the engine's test
catalog. ``load_tables`` reads the parquet files and registers temp
views under their bare names so both the DataFrame API and
``spark.sql`` can address them — mirroring the DuckDB oracle, which
pre-registers the same view names.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLE_NAMES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(spark: SparkSession, sf_dir: str, register: bool = True) -> dict[str, DataFrame]:
    """Read every fixture table from ``sf_dir``; optionally register views.

    Parquet scans get predicate pushdown / column pruning for free, so
    queries should express filters & projections declaratively rather
    than pre-materializing trimmed copies.
    """
    tune(spark)
    cache_key = (id(spark), sf_dir, register)
    cached = _TABLE_CACHE.get(cache_key)
    if cached is not None:
        return dict(cached)
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = _read_parquet(spark, path)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    _TABLE_CACHE[cache_key] = dict(out)
    return out


# DataFrames are immutable plan handles — reusing them across queries in
# one session skips re-reading 10 parquet footers per catalog call.
_TABLE_CACHE: dict[tuple, dict[str, DataFrame]] = {}


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark refuses these
    outright (PARQUET_TYPE_ILLEGAL) while DuckDB silently truncates to
    micros. Detected from file metadata only (no data read)."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with nanosecond-timestamp healing.

    Nanos columns are read as raw int64 (legacy nanosAsLong) and cast to
    microsecond timestamps via integer floor-division — bit-identical to
    the DuckDB oracle's nanos→micros truncation for post-epoch data.
    """
    nanos = _nanos_ts_columns(path)
    if not nanos:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df
