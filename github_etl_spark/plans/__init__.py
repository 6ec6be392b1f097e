"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark DataFrame builder with (where SQL-expressible)
an equivalent DuckDB oracle SQL string. The driver's correctness gate
(`__spark_entry__.py`) re-exports this registry.
"""

from .registry import QUERIES, Query, query  # noqa: F401

# Importing the modules populates the registry.
from . import core  # noqa: E402,F401
from . import etl  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import ext  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401


def spark_queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sqls():
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


def headline_queries():
    return {name: q.fn for name, q in QUERIES.items() if q.headline}
