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

# DataFrames are immutable plan handles — reusing them across queries in
# one session skips re-reading 10 parquet footers per catalog call.
# Keyed by (applicationId, startTime) so a recycled object address can
# never alias a new session; bounded FIFO so long processes juggling
# many (session, dir) pairs don't pin stopped sessions forever.
_TABLE_CACHE: dict[tuple, dict[str, DataFrame]] = {}
_TABLE_CACHE_MAX = 8

# Which sf_dir each session's temp views currently point at — views must
# be re-registered on a cache hit whenever another dir registered in
# between, or spark.sql queries would silently read the wrong data.
_REGISTERED_DIR: dict[tuple, str] = {}


def _session_key(spark: SparkSession) -> tuple:
    sc = spark.sparkContext
    return (sc.applicationId, sc.startTime)


def load_tables(spark: SparkSession, sf_dir: str, register: bool = True) -> dict[str, DataFrame]:
    """Read every fixture table from ``sf_dir``; optionally register views.

    Parquet scans get predicate pushdown / column pruning for free, so
    queries should express filters & projections declaratively rather
    than pre-materializing trimmed copies.
    """
    tune(spark)
    skey = _session_key(spark)
    cache_key = (skey, sf_dir)
    out = _TABLE_CACHE.get(cache_key)
    if out is None:
        out = {}
        for name in TABLE_NAMES:
            out[name] = _read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
        while len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:
            _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
        _TABLE_CACHE[cache_key] = out
    if register and _REGISTERED_DIR.get(skey) != sf_dir:
        for name, df in out.items():
            df.createOrReplaceTempView(name)
        _REGISTERED_DIR[skey] = sf_dir
    return dict(out)


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark refuses these
    outright (PARQUET_TYPE_ILLEGAL) while DuckDB silently truncates to
    micros. Detected from file metadata only (no data read); covers
    tz-aware nanos too (``timestamp[ns, tz=...]``)."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with nanosecond-timestamp healing.

    Nanos columns are read as raw int64 (legacy nanosAsLong) and cast to
    microsecond timestamps via integer floor-division — bit-identical to
    the DuckDB oracle's nanos→micros truncation for post-epoch data.

    Deliberate session-conf side effect: ``nanosAsLong`` stays set once
    a nanos file has been seen. It cannot be restored after this call —
    the conf is consulted again at EXECUTION time, so flipping it back
    would crash the still-lazy scan. Effect on other reads: a plain
    ``spark.read.parquet`` of some OTHER nanos file stops erroring and
    yields int64 columns — surfacing as a type mismatch at first use
    rather than a scan error, the same truncation stance this engine
    adopts deliberately (SURVEY.md §7.4 risk 1).
    """
    nanos = _nanos_ts_columns(path)
    if not nanos:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df
