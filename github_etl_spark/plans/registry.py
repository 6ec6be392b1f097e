"""Registry for the engine's named queries.

A query is a callable ``(spark, sf_dir) -> DataFrame`` plus an optional
DuckDB oracle SQL string (run against the same parquet files, with the
fixture tables pre-registered as views). ``headline`` marks queries that
``bench.py`` times at sf0.1.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    fn: QueryFn
    oracle: str | None = None
    headline: bool = False
    # For a rows-only query (oracle None by declared design): the name
    # of the oracle-checked catalog sibling that value-pins the same
    # semantics (portable/pinned variant or accuracy contract). The
    # rotation places the sibling in the SAME driver window so the
    # ledger always shows the pair green together.
    sibling: str | None = None


QUERIES: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    sibling: str | None = None,
):
    """Decorator registering a query under ``name``.

    Column-name contract: every computed/aggregate column is aliased
    identically in the Spark builder and in ``oracle`` (driver hashes
    values after sorting columns by name). ``sibling`` names the
    oracle-checked companion of a rows-only query (see Query.sibling).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(
            fn=fn, oracle=oracle, headline=headline, sibling=sibling
        )
        return fn

    return deco
