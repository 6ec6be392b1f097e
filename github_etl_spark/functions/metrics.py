"""Observable metrics (SURVEY.md §2.4 A2 — the reference's running
counters, main.py:210-220, as Spark `Observation`s).

`df.observe` attaches accumulator-backed aggregates that are computed
DURING the action that consumes the DataFrame — no second scan, exact
even under task retries (unlike raw accumulators). The engine uses
them where the reference logged running totals/pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_row_metrics(df: DataFrame, *, count_col: str | None = None):
    """Attach (rows, nulls-in-`count_col`) counters; returns
    (df, Observation). Read `observation.get` AFTER an action."""
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("rows")]
    if count_col is not None:
        metrics.append(
            F.sum(F.col(count_col).isNull().cast("long")).alias(f"null_{count_col}")
        )
    return df.observe(obs, *metrics), obs
