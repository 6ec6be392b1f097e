"""Scalar/column function library (SURVEY.md §2.6 + EXT text analysis)."""

from .text import (  # noqa: F401
    lang_id_expr,
    punct_ratio_expr,
    quality_score_expr,
    stopword_ratio_expr,
    token_count_expr,
)
