"""Composed operators Spark lacks natively.

Each is built from DataFrame primitives (single shuffle where one is
unavoidable, broadcast where a side is small) rather than per-group
Python — the 100 TB design stance.
"""

from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    fingerprint_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from .similarity import brute_force_topk, lsh_bucketed_topk  # noqa: F401
