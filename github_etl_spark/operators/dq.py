"""Data-quality constraint verification (Deequ-style, EXT family).

The public pattern (Schelter et al., "Automating Large-Scale Data
Quality Verification", VLDB 2018 — the Deequ system) computes a suite
of declarative constraints over a table in as few passes as possible
and emits a small CONSTRAINT REPORT: one row per constraint with the
measured metric, the violation count, and a pass/fail verdict.  In a
100 TB training-data pipeline this is the gate that runs between
ingest and every downstream consumer.

Engine design (Spark-first, scale-first):

- **Row metrics fuse into ONE scan.** Completeness and compliance
  constraints are all `SUM(CASE ...)` aggregates, so any number of
  them costs a single pass with partial (map-side) aggregation and a
  single one-row exchange — adding a constraint adds a column, not a
  pass.
- **Key metrics fuse into ONE groupBy.** Uniqueness (fraction of
  values occurring exactly once) and distinctness (fraction of
  distinct values) both derive from `groupBy(key).count()`, so they
  share one keyed exchange.  This deliberately avoids mixing
  COUNT(DISTINCT) into the row-metric aggregate, which would plan an
  Expand + two keyed exchanges over the full table.
- **Referential integrity aggregates BEFORE joining.** Child keys are
  grouped first (shuffle width = |distinct keys|, not |rows|), then
  left-anti-joined to the parent key set — broadcastable whenever the
  parent is a dimension, AQE decides otherwise.
- The per-constraint rows are emitted with a single `stack()`
  projection over the fused one-row aggregates, so no branch of the
  report recomputes a scan.

Reference parity note: the reference engine (mozilla-conduit
github-etl, main.py) validates records imperatively while fetching
(null-user / empty-body skips); this module is the declarative,
set-based generalization of that gate for the LLM-pipeline surface
(SURVEY.md text-analysis/pipeline family).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round_det


@dataclass(frozen=True)
class Compliance:
    """A named predicate constraint: ``metric`` = fraction of rows
    satisfying ``predicate`` (NULL counts as a violation).  Pass/fail
    thresholds live in ``constraint_report``'s (name, threshold) list
    — deliberately NOT here, so the metric computation stays
    threshold-free and one metric column can be judged against
    different gates."""

    name: str
    predicate: Column


def row_metrics(
    df: DataFrame,
    completeness: list[str],
    compliance: list[Compliance],
) -> DataFrame:
    """One-row frame with all scan-fusable metrics: ``total`` plus one
    violation count per constraint (column ``v_<name>``)."""
    aggs = [F.count(F.lit(1)).alias("total")]
    for col in completeness:
        aggs.append(
            (F.count(F.lit(1)) - F.count(col)).alias(f"v_completeness_{col}")
        )
    for c in compliance:
        ok = F.when(c.predicate, 1).otherwise(0)
        # coalesce: SUM over zero rows is NULL; an empty table has
        # zero violations, not NULL ones.
        aggs.append(
            (F.count(F.lit(1)) - F.coalesce(F.sum(ok), F.lit(0))).alias(
                f"v_{c.name}"
            )
        )
    return df.agg(*aggs)


def key_metrics(df: DataFrame, key: str) -> DataFrame:
    """One-row frame with uniqueness/distinctness violation counts for
    ``key`` via a single groupBy pass: ``v_uniqueness_<key>`` = rows
    whose key value occurs more than once (Deequ's uniqueness),
    ``v_distinctness_<key>`` = rows minus distinct values."""
    g = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
    total = F.coalesce(F.sum("c"), F.lit(0))
    once = F.coalesce(F.sum(F.when(F.col("c") == 1, 1).otherwise(0)), F.lit(0))
    return g.agg(
        (total - once).alias(f"v_uniqueness_{key}"),
        (total - F.count(F.lit(1))).alias(f"v_distinctness_{key}"),
    )


def referential_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """One-row frame ``v_ref_<child_key>``: child rows whose non-NULL
    key has no parent (NULL keys are a completeness concern, not an
    RI one).  Grouped before the anti-join so the join is over
    distinct keys."""
    keyed = (
        child.where(F.col(child_key).isNotNull())
        .groupBy(child_key)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    orphans = keyed.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    return orphans.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias(f"v_ref_{child_key}")
    )


def constraint_report(
    metrics: DataFrame,
    constraints: list[tuple[str, float]],
) -> DataFrame:
    """Assemble the report from the cross-joined one-row metric frames.

    ``metrics`` must carry ``total`` and one ``v_<name>`` column per
    entry in ``constraints`` (name, threshold).  Output: one row per
    constraint — (constraint_name, metric, threshold, n_violations,
    passed), where metric = round6(1 - violations/total) and
    passed = metric >= threshold.  A single stack() projection: no
    branch recomputes an input scan.
    """
    if not constraints:
        raise ValueError("constraint_report needs at least one constraint")
    parts = []
    for name, threshold in constraints:
        parts.append(
            f"'{name}', CAST(v_{name} AS BIGINT), CAST({threshold!r} AS DOUBLE)"
        )
    stacked = metrics.select(
        F.expr(
            f"stack({len(constraints)}, {', '.join(parts)}) "
            "AS (constraint_name, n_violations, threshold)"
        ),
        F.col("total"),
    )
    metric = round_det(
        1.0 - F.col("n_violations") / F.greatest(F.col("total"), F.lit(1)), 6
    )
    return stacked.select(
        "constraint_name",
        metric.alias("metric"),
        "threshold",
        "n_violations",
        (metric >= F.col("threshold")).alias("passed"),
    )


def drift_report(
    base: DataFrame,
    curr: DataFrame,
    metrics: list[str],
    threshold: float = 0.05,
) -> DataFrame:
    """Metric drift between two snapshot metric frames (the Deequ
    metrics-repository pattern: yesterday's profile vs today's).

    ``base``/``curr``: ONE-ROW frames carrying the same metric columns
    (every metric already deterministic-rounded by its producer).
    Output: one row per metric — (metric_name, base_value, curr_value,
    rel_delta, drifted) with rel_delta = round6(|curr-base| /
    max(|base|, 1)) and drifted = rel_delta > threshold.  The
    cross-join of two one-row frames costs nothing; the report is a
    single stack() projection."""
    if not metrics:
        raise ValueError("drift_report needs at least one metric")
    b = base.select([F.col(m).alias(f"__b_{m}") for m in metrics])
    c = curr.select([F.col(m).alias(f"__c_{m}") for m in metrics])
    parts = [
        f"'{m}', CAST(__b_{m} AS DOUBLE), CAST(__c_{m} AS DOUBLE)"
        for m in metrics
    ]
    stacked = b.crossJoin(c).select(
        F.expr(
            f"stack({len(metrics)}, {', '.join(parts)}) "
            "AS (metric_name, base_value, curr_value)"
        )
    )
    rel = round_det(
        F.abs(F.col("curr_value") - F.col("base_value"))
        / F.greatest(F.abs(F.col("base_value")), F.lit(1.0)),
        6,
    )
    return stacked.select(
        "metric_name",
        "base_value",
        "curr_value",
        rel.alias("rel_delta"),
        (rel > F.lit(float(threshold))).alias("drifted"),
    )
