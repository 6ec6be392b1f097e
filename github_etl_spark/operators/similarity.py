"""Similarity search over an embedding column (EXT — SURVEY.md §2.11).

Brute-force cosine top-k is the correctness baseline: broadcast the
(small) query set against the corpus, dot products via higher-order
functions (zip_with/aggregate — JVM-side, no Python), rank with a
window. The scale path buckets the corpus with random-hyperplane LSH so
each query only scans matching buckets — the same candidate-generation
idea as MinHash LSH but for cosine space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.rounding import round_det
from .partitioning import ensure_parallelism


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a, b):
    """Σ aᵢ·bᵢ — sequential left fold, deterministic element order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a):
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (it's the small side by construction),
    so the corpus is scanned exactly once with no shuffle before the
    final per-query top-k window — which runs on query_id partitions,
    i.e. parallelism = #queries. Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    # Per-row cost is O(dim × #queries) — widen a narrow corpus scan
    # (no-op at scale, where the corpus arrives in many partitions).
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("q_vec"), F.col("c_vec")).alias("cosine_raw"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank"),
            round_det("cosine_raw", 4).alias("cosine"),
        )
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes.

    A tiny xorshift-style LCG keeps this dependency-free and stable
    across runs/engines (no RNG state from numpy needed driver-side).
    """
    planes: list[list[float]] = []
    state = seed & 0x7FFFFFFF or 1
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            v.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(v)
    return planes


def signs_expr(vec, planes: list[list[float]]):
    """LSH bucket id: sign bits of the vector against each hyperplane."""
    bits = [
        F.when(dot_expr(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        * (1 << i)
        for i, p in enumerate(planes)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("long")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket
    are scored. 2^n_planes buckets → expected candidate fraction
    2^-n_planes of the corpus per query; recall vs brute force is
    asserted in tests (raise n_planes / add band repetitions to trade
    recall for cost at 100 TB).
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("bucket", signs_expr(F.col("q_vec"), planes))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
    ).withColumn("bucket", signs_expr(F.col("c_vec"), planes))

    scored = c.join(
        F.broadcast(q.withColumnRenamed("bucket", "q_bucket")),
        (F.col("q_bucket") == F.col("bucket"))
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_expr(F.col("q_vec"), F.col("c_vec")).alias("cosine_raw"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", round_det("cosine_raw", 4).alias("cosine"))
    )
