"""Cross-engine-deterministic rounding.

Spark's ROUND on doubles is BigDecimal HALF_UP; DuckDB's goes through
C++ nearbyint (half-even under the default FP mode). On identical
inputs they disagree on ~0.2% of 2-dp roundings — enough to fail a
value-hash gate on any large result. Both engines agree exactly on
floor/multiply/add/divide, so the engine standardizes on

    round_det(x, d) = floor(x * 10^d + 0.5) / 10^d

emitted identically in the DataFrame expression and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def round_det(col, digits: int = 2):
    """Deterministic half-up rounding as a Spark column (double)."""
    if isinstance(col, str):
        col = F.col(col)
    p = float(10**digits)
    return F.floor(col * F.lit(p) + F.lit(0.5)).cast("double") / F.lit(p)


def sql_round(expr: str, digits: int = 2) -> str:
    """The same rounding as DuckDB SQL text."""
    p = 10**digits
    return f"(floor(({expr}) * {p} + 0.5) / {p})"
