"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``github_etl_spark.plans`` — one entry per
operator row of SURVEY.md §2 (+ the EXT north-star operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from github_etl_spark import plans  # noqa: E402
from github_etl_spark.plans.etl import flagship_df  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's semantic spine in one plan
    (SURVEY.md §7.2): synthesized-title regex bug-id extraction,
    broadcast dimension join, conditional min-agg, left-outer
    enrichment, projection/rename, constant partition columns.
    """
    return flagship_df(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted entries (engine-specific
    hashes / approximate sketches) get the driver's rows-only check and
    are instead property-tested in tests/."""
    return plans.oracle_sqls()
