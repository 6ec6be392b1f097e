"""Similarity search over an embedding column (EXT — SURVEY.md §2.11).

Brute-force cosine top-k is the correctness baseline: broadcast the
(small) query set against the corpus, dot products via higher-order
functions (zip_with/aggregate — JVM-side, no Python), rank with a
window. The scale path buckets the corpus with random-hyperplane LSH so
each query only scans matching buckets — the same candidate-generation
idea as MinHash LSH but for cosine space.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
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
    """NULL (not NaN) for a zero-norm side: 0/0 would give NaN, which
    Spark sorts as the LARGEST double — a single all-zeros embedding
    would otherwise outrank every true neighbor in a desc top-k. NULLs
    sort last under desc, dropping degenerate vectors to the bottom."""
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom != 0, dot_expr(a, b) / denom)


def _topk_per_query(scored, k: int):
    """Shared per-query top-k tail: deterministic rank (cosine desc,
    neighbor id asc — NULL cosines last), k rows per query."""
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            round_det("cosine_raw", 4).alias("cosine"),
        )
    )


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
    return _topk_per_query(scored, k)


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


def md5_int_planes(
    dim: int, n_planes: int, table: int = 0
) -> list[list[int]]:
    """Integer hyperplane components derived from md5 — the portable
    sibling of `random_hyperplanes`.

    Component (p, i) = first 4 hex digits of md5("lsh:{table}:{p}:{i}")
    as an int, recentered to [-32768, 32767]. md5 is the one hash Spark,
    DuckDB and Python's hashlib all share, so an oracle can inline the
    SAME constants (or re-derive them in SQL) and replay bucket
    assignment bit-for-bit — the trick the MinHash/SimHash portable
    variants use (see operators/dedup.py), applied to cosine LSH.
    """
    import hashlib

    return [
        [
            int(hashlib.md5(f"lsh:{table}:{p}:{i}".encode()).hexdigest()[:4], 16)
            - 32768
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def portable_bucket_expr(vec, planes: list[list[int]], quant: int = 1000):
    """Cross-engine-exact LSH bucket id.

    The float-hyperplane path (`signs_expr`) is unverifiable across
    engines: a dot product near zero can flip sign under a different
    float summation order, silently moving a vector to another bucket.
    This path quantizes the vector to integers (floor(v*quant + 0.5) —
    one double multiply + add, bit-identical under IEEE in any engine)
    and dots it against INTEGER plane components, so the sign decision
    is exact integer arithmetic: associativity-free, overflow-safe
    (|component| < 2^15, |qv_i| ~ quant, dims ~ 10^2 → sums ≪ 2^63),
    and reproducible in plain SQL.
    """
    qv = F.transform(
        vec, lambda x: F.floor(x.cast("double") * quant + F.lit(0.5))
    )
    bits = []
    for p_idx, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(qv, F.array(*[F.lit(c) for c in p]), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p_idx)).otherwise(F.lit(0)))
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
    n_tables: int = 1,
    hash_family: str = "lcg",
    quant: int = 1000,
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing a query's LSH
    bucket are scored. 2^n_planes buckets → expected candidate fraction
    2^-n_planes of the corpus per query per table.

    ``n_tables`` adds band repetitions (multi-table LSH): each table
    hashes with an independent hyperplane set, and a pair is a
    candidate if it collides in ANY table — recall rises ~(1-(1-p)^L)
    for per-table collision probability p, at L× candidate cost
    (recall-vs-tables monotonicity asserted in tests). Implemented as
    per-side bucket ARRAYS and an `exists(zip_with(=))` join predicate,
    so each pair is scored once (no union + distinct pass), and the
    query side stays a single broadcast.

    ``hash_family``: ``lcg`` (default) keeps the float hyperplanes from
    `random_hyperplanes` — engine-specific, so only property-testable.
    ``md5_portable`` derives INTEGER plane components from md5 and
    quantizes vectors to integers (`portable_bucket_expr`), making
    bucket assignment exact and replayable in DuckDB — the catalog's
    `sim_lsh_topk_portable` oracle-checks the full bucket → candidate
    → cosine → top-k pipeline value-for-value. The portable path drops
    NULL/empty vectors on both sides (they have no meaningful bucket;
    same contract as `ivf_topk`), the default path keeps its historical
    bucket-0 placement for them.
    """
    if hash_family == "md5_portable":
        int_tables = [
            md5_int_planes(dim, n_planes, table=t) for t in range(n_tables)
        ]
        bucket_arr = lambda vec: F.array(  # noqa: E731
            *[portable_bucket_expr(vec, planes, quant) for planes in int_tables]
        )
        valid = F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
        corpus = corpus.where(valid)
        queries = queries.where(valid)
    elif hash_family == "lcg":
        tables = [
            random_hyperplanes(dim, n_planes, seed + 7919 * t)
            for t in range(n_tables)
        ]
        bucket_arr = lambda vec: F.array(  # noqa: E731
            *[signs_expr(vec, planes) for planes in tables]
        )
    else:
        raise ValueError(f"unknown LSH hash family: {hash_family!r}")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("q_buckets", bucket_arr(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
    ).withColumn("c_buckets", bucket_arr(F.col("c_vec")))

    if n_tables == 1:
        # Single table: expose the bucket as a scalar equi-key so the
        # planner picks BroadcastHashJoin (the exists() predicate below
        # would force a nested-loop probe of every pair).
        collide = F.element_at(F.col("q_buckets"), 1) == F.element_at(
            F.col("c_buckets"), 1
        )
    else:
        collide = F.exists(
            F.zip_with(F.col("q_buckets"), F.col("c_buckets"), lambda a, b: a == b),
            lambda x: x,
        )
    scored = c.join(
        F.broadcast(q),
        collide & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_expr(F.col("q_vec"), F.col("c_vec")).alias("cosine_raw"),
    )
    return _topk_per_query(scored, k)


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 42,
) -> list[list[float]]:
    """Coarse quantizer for IVF: k-means over a bounded, deterministic
    corpus sample, run driver-side with numpy.

    The sample is hash-selected (orderBy xxhash64 + limit → planned as
    a distributed top-k, not a full sort), so it's stable across runs
    and partitionings, and the driver transfer is bounded at
    `sample_size` rows no matter the corpus size — one corpus scan to
    train, which is what makes this viable at 100 TB (FAISS trains IVF
    on a sample the same way). Empty-cell centroids are re-seeded from
    the farthest points (standard k-means repair).
    """
    import numpy as np

    sample = (
        corpus.select(_as_double(F.col(vec_col)).alias("v"))
        .where(F.size("v") > 0)
        # xxhash64 hashes arrays natively — 3× faster than hashing a
        # stringified copy, same stable-sample property.
        .orderBy(F.xxhash64(F.col("v")))
        .limit(sample_size)
        .collect()
    )
    if not sample:
        # Empty (or all-degenerate) corpus: no cells to train. Callers
        # treat [] as "no index" and produce empty, correctly-typed
        # results rather than crashing on a 0-row matmul.
        return []
    x = np.array([r.v for r in sample], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms == 0, 1.0, norms)
    # Farthest-first init (deterministic kmeans++ flavor): start from
    # the first hash-ordered point, then greedily take the point least
    # similar to any chosen centroid. No RNG → stable across runs AND
    # across sample orderings' rng states; spreads seeds better than a
    # uniform draw, which matters for probe recall at small nprobe.
    k_eff = min(n_centroids, len(x))
    chosen = [0]
    best_sim = x @ x[0]
    for _ in range(1, k_eff):
        nxt = int(best_sim.argmin())
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, x @ x[nxt])
    cent = x[chosen].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                cent[c] = m / (n or 1.0)
            else:
                # K-th farthest point per empty cell — distinct seeds
                # (one shared farthest point would leave twin centroids
                # and a dead cell).
                order = np.argsort(sims.max(axis=1))
                empties = [i for i in range(len(cent)) if not (assign == i).any()]
                cent[c] = x[order[empties.index(c) % len(x)]]
    return cent.tolist()


def _cell_sims_expr(vec, centroids: list[list[float]]):
    """Array of cosine-ish scores of `vec` against each centroid.

    Centroids are unit vectors, so dot(vec, centroid) ranks cells the
    same as cosine for a fixed vec — no per-row norm needed.
    """
    return F.array(
        *[dot_expr(vec, F.array(*[F.lit(x) for x in c])) for c in centroids]
    )


def _nearest_cells_udf(centroids: list[list[float]], nprobe: int | None):
    """Arrow-batched centroid scoring: rows × centroids as ONE numpy
    matmul per batch. The per-centroid `aggregate(zip_with(...))`
    expression tower is interpreted (off the codegen path) and measured
    ~10× slower at 16×64; matrix work is the textbook Pandas-UDF case.
    Ties resolve to the lowest cell id in both paths (np argmax /
    stable argsort ↔ array_position-of-max / struct sort).
    ``nprobe=None`` → int cell per row; else array of nprobe cells.
    """
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(centroids, dtype=np.float64)

    if nprobe is None:

        @pandas_udf("int")
        def nearest(v: pd.Series) -> pd.Series:
            x = np.asarray(v.tolist(), dtype=np.float64)
            return pd.Series((x @ mat.T).argmax(axis=1).astype("int32"))

        return nearest

    @pandas_udf("array<int>")
    def nearest_n(v: pd.Series) -> pd.Series:
        x = np.asarray(v.tolist(), dtype=np.float64)
        order = np.argsort(-(x @ mat.T), axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype("int32")))

    return nearest_n


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = True,
) -> DataFrame:
    """Assign every corpus vector to its nearest-centroid cell (the IVF
    "inverted list" id). At scale, write the result partitioned /
    bucketed BY CELL so probes prune to nprobe directories and the
    probe join needs no corpus shuffle.

    ``arrow=True`` (default) scores rows×centroids as one numpy matmul
    per Arrow batch — measured 10× faster than the pure-expression
    path at 16 centroids × 64 dims with identical assignments (tested);
    ``arrow=False`` keeps the dependency-free JVM expression form.
    Vectors must be fixed-dimension and non-null (the embeddings
    contract) on the arrow path.
    """
    if not centroids:
        return corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("c_vec"),
            F.lit(None).cast("int").alias("cell"),
        ).filter(F.lit(False))
    # Degenerate vectors (NULL / empty) can't be assigned a cell — drop
    # them instead of letting a single bad row crash the Arrow matmul.
    corpus = corpus.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    )
    if arrow:
        cell = _nearest_cells_udf(centroids, None)(
            _as_double(F.col(vec_col))
        ).alias("cell")
    else:
        sims = _cell_sims_expr(_as_double(F.col(vec_col)), centroids)
        cell = (
            (F.array_position(sims, F.array_max(sims)) - 1).cast("int").alias("cell")
        )
    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
        cell,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 4096,
    seed: int = 42,
    arrow: bool = True,
    train_on: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k cosine: score only corpus vectors whose
    cell is among the query's `nprobe` closest centroids.

    ``train_on`` (default: the corpus) restricts centroid TRAINING to
    a sub-frame while still assigning/scoring the full corpus — the
    inline form of querying an index built before later appends
    arrived (`ivf_index_append`'s stale-centroid regime), used by the
    equivalence pin in tests/test_similarity.py.

    Cost per query ≈ (nprobe / n_centroids) of the corpus vs brute
    force; recall rises with nprobe (asserted in tests). The probed
    query set (query_id × nprobe cells) is broadcast, so the only wide
    operation is the final per-query top-k window. Centroid training is
    sample-bounded; assignment is one corpus pass. Candidate scoring
    stays a JVM expression in both modes (cosine_expr's NULL-for-
    zero-norm ranking semantics); ``arrow`` only switches the
    centroid-scoring step (see ivf_assign).

    Degenerate vectors (NULL / empty array) are silently dropped on
    BOTH sides: a corpus row without a vector can't be assigned a cell
    and a query row without a vector can't rank cells, so such queries
    are simply absent from the result (fewer groups, not an error).
    Pre-filter and fail upstream if that should be a hard error.
    """
    centroids = train_ivf_centroids(
        corpus if train_on is None else train_on,
        vec_col, n_centroids, sample_size, seed=seed,
    )
    assigned = ivf_assign(corpus, centroids, id_col, vec_col, arrow=arrow)
    q = _probed_queries(queries, centroids, id_col, vec_col, nprobe, arrow)
    return _score_probed(assigned, q, k)


def _probed_queries(
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    nprobe: int,
    arrow: bool,
) -> DataFrame:
    """(query_id, q_vec, cell) — one row per query × probed cell.

    Shared by the inline and materialized-index paths so their probe
    selection cannot diverge (the index roundtrip test asserts exact
    equality of results)."""
    if not centroids:
        return queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("q_vec"),
            F.lit(None).cast("int").alias("cell"),
        ).filter(F.lit(False))
    # A NULL/empty query vector can't rank cells — it contributes no
    # probes (mirrors the corpus-side degenerate-vector drop).
    queries = queries.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    )
    if arrow:
        probe_cells = _nearest_cells_udf(centroids, nprobe)(
            _as_double(F.col(vec_col))
        )
    else:
        q_sims = _cell_sims_expr(_as_double(F.col(vec_col)), centroids)
        # Rank cells per query: sort (-sim, cell) structs asc → sim
        # desc with lowest-cell tie order (same as the arrow path).
        probe_cells = F.transform(
            F.slice(
                F.array_sort(
                    F.transform(
                        q_sims,
                        lambda s, i: F.struct(
                            (-s).alias("neg_sim"), i.cast("int").alias("cell")
                        ),
                    )
                ),
                1,
                nprobe,
            ),
            lambda s: s["cell"],
        )
    return queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
        F.explode(probe_cells).alias("cell"),
    )


def _score_probed(assigned: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Shared scoring tail: broadcast the probed queries against the
    cell-matched corpus vectors, cosine-score, per-query top-k."""
    scored = assigned.join(F.broadcast(q), ["cell"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_expr(F.col("q_vec"), F.col("c_vec")).alias("cosine_raw"),
    )
    return _topk_per_query(scored, k)


def ivf_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
    arrow: bool = True,
    centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Materialize the IVF index `ivf_topk` computes inline: cell
    assignments written as parquet PARTITIONED BY cell, centroids as a
    one-line text sidecar at ``<path>_centroids``.

    ``centroids`` overrides the k-means training with caller-supplied
    cells (e.g. the portable md5 seeds, so an oracle or a fold sibling
    can re-derive the index's assignment — streaming/vector_gate.py).

    This is the 100 TB shape of the design note on `ivf_assign`: train
    once (sample-bounded), assign once (one corpus pass), write once —
    then every query batch reads only its probed cell directories
    (static partition pruning, see `ivf_query_index`) instead of
    re-scoring the corpus. Both artifacts go through Spark writers, so
    the layout works on any supported filesystem, not just local disk.

    The two artifacts are stitched by a build fingerprint (md5 of the
    centroid list) embedded in BOTH: a `build_id` column in the
    assignment parquet and a `build_id` field in the sidecar JSON.
    `ivf_query_index` asserts they match, so a crash between the two
    writes (or a rebuild racing a reader) surfaces as a clear error
    instead of silently probing the wrong cells. Degenerate corpus
    vectors (NULL / empty) are dropped before assignment — they cannot
    be placed in a cell (see `ivf_assign`). Returns the trained
    centroids.
    """
    import hashlib
    import json

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, vec_col, n_centroids, sample_size, seed=seed
        )
    build_id = hashlib.md5(
        json.dumps(centroids).encode("utf-8")
    ).hexdigest()
    assigned = (
        ivf_assign(corpus, centroids, id_col, vec_col, arrow=arrow)
        .withColumn("build_id", F.lit(build_id))
        # Build rows live in ingest_batch −1; `ivf_index_append` adds
        # later vectors under their own batch partition (second
        # partition level, so `cell` directory pruning is unchanged)
        # with dynamic-overwrite idempotence.
        .withColumn("ingest_batch", F.lit(-1).cast("long"))
    )
    writer = assigned.write.mode("overwrite")
    if centroids:
        writer = writer.partitionBy("cell", "ingest_batch")
    # Empty corpus → no centroids → skip partitionBy: a partitioned
    # write of a 0-row frame emits only _SUCCESS (no parquet footer)
    # and a later read fails UNABLE_TO_INFER_SCHEMA. Writing it
    # unpartitioned keeps `cell` as a (schema-bearing) data column, so
    # ivf_query_index still reads, filters and returns 0 rows cleanly.
    writer.parquet(path)
    spark = corpus.sparkSession
    sidecar = json.dumps({"build_id": build_id, "centroids": centroids})
    spark.createDataFrame([(sidecar,)], "value string").coalesce(
        1
    ).write.mode("overwrite").text(path + "_centroids")
    return centroids


def _read_ivf_sidecar(spark, path: str) -> tuple[list, str | None]:
    """(centroids, build_id) from the `ivf_build_index` sidecar —
    shared by the query and append paths so a missing/partial build
    fails identically everywhere."""
    import json

    sidecar_path = path + "_centroids"
    try:
        head = spark.read.text(sidecar_path).head()
    except Exception as e:  # AnalysisException — sidecar dir missing
        raise FileNotFoundError(
            f"IVF centroid sidecar not found at {sidecar_path!r} — "
            "was ivf_build_index run (and did it finish)?"
        ) from e
    if head is None:
        raise ValueError(
            f"IVF centroid sidecar at {sidecar_path!r} is empty — "
            "partial/failed ivf_build_index write; rebuild the index."
        )
    meta = json.loads(head[0])
    if isinstance(meta, dict):
        return meta["centroids"], meta.get("build_id")
    return meta, None  # legacy bare-list sidecar (pre-fingerprint builds)


def ivf_index_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    ingest_batch: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = True,
) -> None:
    """Incremental IVF maintenance: assign NEW vectors to the
    EXISTING index's cells (sidecar centroids — no retraining) and
    dynamic-overwrite exactly the touched ``(cell, ingest_batch=N)``
    partitions, the membership-store append discipline
    (operators/incremental.dedup_index_append) applied to the vector
    index. A replayed/retried append republishes its own partitions —
    idempotent under at-least-once delivery; `cell`-level directory
    pruning in `ivf_query_index` is untouched (ingest_batch is the
    SECOND partition level).

    The appended rows carry the sidecar's build fingerprint, so the
    build-vs-assignment consistency probe keeps working across
    appends; a rebuild (new build_id) racing an append surfaces as
    the usual mismatch error at query time.

    Centroids go STALE as the corpus drifts — that is a measured
    contract, not a hope: `sim_ivf_append_recall` (plans/ext.py) pins
    recall@5 of stale-centroid retrieval against a fresh rebuild,
    per query. Batch −1 is reserved for build rows (raises).

    At 100 TB: per-ingest cost is one batch-sized assignment pass
    (centroid scoring is Arrow-batched, map-only) + a write touching
    ≤ min(|batch|, n_centroids) cell directories; the index is never
    rewritten and never shuffled."""
    if int(ingest_batch) == -1:
        raise ValueError(
            "ingest_batch -1 is reserved for ivf_build_index rows; "
            "use a non-negative batch id"
        )
    centroids, build_id = _read_ivf_sidecar(spark, path)
    if not centroids:
        raise ValueError(
            f"IVF index at {path!r} has no centroids (empty-corpus "
            "build) — appends cannot be assigned; rebuild with data"
        )
    assigned = (
        ivf_assign(new_vectors, centroids, id_col, vec_col, arrow=arrow)
        .withColumn("build_id", F.lit(build_id))
        .withColumn("ingest_batch", F.lit(int(ingest_batch)).cast("long"))
    )
    (
        assigned.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell", "ingest_batch")
        .parquet(path)
    )


def _ivf_fold_marker(path: str) -> str:
    return path + "_folding"


def ivf_index_fold(spark, path: str) -> int:
    """Collapse the per-append ``ingest_batch`` partitions into ONE
    fresh batch id per cell — the partition-count maintenance op for
    an appended IVF index (after thousands of `ivf_index_append`
    micro-batches, scan cost is directory listing, not bytes), the
    `fold_partitions` discipline with one crucial difference: a
    half-folded VECTOR index is NOT a harmless superset. Duplicated
    vectors change query results (the same neighbor scores twice and
    occupies two top-k slots), so unlike the membership stores the
    fold is guarded by a MARKER: written FIRST, removed LAST, and
    `ivf_query_index` refuses to serve while it exists. A crash at
    any point leaves the marker; re-running the fold converges (it
    re-distincts every surviving row into a fresh batch id and
    deletes the rest) and re-enables queries.

    Returns the number of partitions folded (0 = nothing to do:
    a single batch id and no leftover marker). Run only with no
    in-flight append whose batch may replay — folding erases batch
    identity (the standard streaming-compaction caveat).

    Local-filesystem marker/deletes (os/shutil), like the snapshot
    retention sweep — at cloud scale swap for the Hadoop FileSystem
    API."""
    import shutil

    from ..sinks.compact import partition_stats

    centroids, _bid = _read_ivf_sidecar(spark, path)
    if not centroids:
        return 0  # empty-corpus build: unpartitioned, nothing to fold
    marker = _ivf_fold_marker(path)
    stats = partition_stats(path)
    batches = {p["partition"].get("ingest_batch") for p in stats}
    if len(batches) <= 1 and not os.path.exists(marker):
        return 0
    existing = [int(b) for b in batches if b is not None]
    into = min(existing + [-1]) - 1
    os.makedirs(marker, exist_ok=True)
    with open(os.path.join(marker, "MARKER"), "w") as f:
        f.write(f"folding into ingest_batch={into}\n")
    df = spark.read.parquet(path)
    data_cols = [c for c in df.columns if c != "ingest_batch"]
    (
        df.select(*data_cols)
        .distinct()
        .withColumn("ingest_batch", F.lit(into).cast("long"))
        .write.mode("append")
        .partitionBy("cell", "ingest_batch")
        .parquet(path)
    )
    failed: list[str] = []
    for p in stats:
        src = os.path.join(
            path,
            f"cell={p['partition']['cell']}",
            f"ingest_batch={p['partition']['ingest_batch']}",
        )
        try:
            shutil.rmtree(src)
        except OSError as e:
            failed.append(f"{src}: {e}")
    if failed:
        # Marker stays — queries keep refusing until a re-run
        # finishes the job.
        raise RuntimeError(
            f"ivf_index_fold: consolidated rows are written to "
            f"ingest_batch={into} but {len(failed)} source partition(s) "
            f"could not be deleted (marker left in place; re-run to "
            f"converge): " + "; ".join(failed)
        )
    shutil.rmtree(marker)
    return len(stats)


def ivf_query_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    arrow: bool = True,
) -> DataFrame:
    """Top-k cosine against a materialized `ivf_build_index` layout.

    The probed cell set is computed from the (small) query batch and
    pushed as a STATIC ``cell IN (...)`` partition filter, so the scan
    touches only ``≤ queries×nprobe`` of the index's cell directories —
    no corpus shuffle, no full scan (asserted against the executed
    plan's PartitionFilters in tests). Probe selection and the scoring
    tail are the same helpers `ivf_topk` uses, so for the same
    centroids the results are identical to the inline path.

    Queries with NULL / empty vectors contribute no probes and are
    silently absent from the result (same contract as `ivf_topk`);
    pre-filter upstream if that should be an error. The sidecar and
    parquet `build_id` fingerprints must agree (see `ivf_build_index`)
    — a mismatch raises instead of probing against the wrong centroids.
    """
    centroids, build_id = _read_ivf_sidecar(spark, path)
    if os.path.exists(_ivf_fold_marker(path)):
        # A crashed ivf_index_fold leaves duplicated vectors — NOT a
        # harmless superset for top-k (a duplicate occupies two result
        # slots). Refuse until the fold is re-run to completion.
        raise RuntimeError(
            f"IVF index at {path!r} has an unfinished fold (marker "
            f"{_ivf_fold_marker(path)!r}) — re-run ivf_index_fold to "
            "converge before querying"
        )
    # Materialize the probed query set once (bounded: queries×nprobe
    # rows): it is consumed twice — the IN-list below and the scoring
    # join — and would otherwise re-run the centroid-scoring UDF per
    # consumer.
    q = _probed_queries(
        queries, centroids, id_col, vec_col, nprobe, arrow
    ).localCheckpoint(eager=True)
    # Bounded driver transfer: queries×nprobe ints. A static IN-filter
    # guarantees directory-level pruning (dynamic partition pruning
    # would also work but depends on join planning).
    cells = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    assigned = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    if "ingest_batch" in assigned.columns:
        # Batch identity is append-bookkeeping (idempotent replay),
        # not scoring input.
        assigned = assigned.drop("ingest_batch")
    if build_id is not None and "build_id" in assigned.columns:
        # One tiny limit(1) probe per query batch (reads a single row
        # group): assignments and sidecar must come from the SAME
        # training run, else the probed cells are meaningless.
        row = assigned.select("build_id").limit(1).head()
        if row is not None and row[0] != build_id:
            raise ValueError(
                f"IVF index at {path!r} is inconsistent: assignment "
                f"parquet build_id={row[0]!r} != sidecar build_id="
                f"{build_id!r}. A rebuild crashed between the two "
                "writes or raced this reader; rebuild the index."
            )
        assigned = assigned.drop("build_id")
    return _score_probed(assigned, q, k)


# ---------------------------------------------------------------------------
# Portable (cross-engine-exact) IVF variant
# ---------------------------------------------------------------------------


def quantize_expr(vec, quant: int = 1000):
    """vec → array<long>: floor(v*quant + 0.5) per component. One double
    multiply + add then floor — bit-identical under IEEE in any engine,
    so integer arithmetic downstream is exactly replayable in SQL (the
    same quantization `portable_bucket_expr` uses)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * quant + F.lit(0.5))
    )


def ivf_portable_seed_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    quant: int = 1000,
) -> list[list[int]]:
    """Deterministic, cross-engine-replayable coarse-quantizer seeds:
    the `n_centroids` corpus vectors ranked first by
    ``(md5(cast(id as string)), id)``, quantized to integers.

    No Lloyd iterations and no normalization — the whole selection is
    discrete (md5 hex ordering + integer quantization), so DuckDB can
    re-derive the SAME centroids from the same table with
    ``ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT n`` and replay cell
    assignment exactly (`sim_ivf_topk_portable` in plans/ext.py). The
    headline `ivf_topk` keeps the k-means quantizer; this variant
    trades cell quality for bit-for-bit verifiability of the IVF
    retrieval pipeline (assignment → probe → score → top-k), the same
    bar `portable_bucket_expr` sets for LSH.

    orderBy+limit plans as a distributed top-k (no full sort); the
    driver transfer is bounded at `n_centroids` rows.
    """
    rows = (
        corpus.where(
            F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
        )
        .select(
            F.col(id_col).alias("i"),
            quantize_expr(F.col(vec_col), quant).alias("qv"),
        )
        .orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
        .limit(n_centroids)
        .collect()
    )
    return [list(r.qv) for r in rows]


def _int_cell_rank_expr(qv, centroids: list[list[int]]):
    """array<struct<neg_dot:long, cell:int>> sorted ascending — i.e.
    cells ranked by EXACT integer dot product desc, lowest cell on
    ties. Overflow-safe: |qv_i| ~ quant, |cv_i| ~ quant, dims ~ 10^2 →
    |dot| ≪ 2^63."""
    sims = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    qv, F.array(*[F.lit(c) for c in cent]), lambda a, b: a * b
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            for cent in centroids
        ]
    )
    return F.array_sort(
        F.transform(
            sims,
            lambda s, i: F.struct(
                (-s).alias("neg_dot"), i.cast("int").alias("cell")
            ),
        )
    )


# Above this cell count the per-ROW cost and generated-code size of the
# literal-expression assignment (O(cells·dim) literals inlined into the
# plan) dominate: measured at 512 cells it OOM'd a 32-thread local JVM
# on a 64k-vector corpus, while the Arrow matmul form runs in seconds.
_ARROW_ASSIGN_CELLS = 64


def _int_cell_assign_arrow(qv, centroids: list[list[int]]):
    """cell = argmax_c (qv · centroid_c), ties → LOWEST cell — the same
    top cell `_int_cell_rank_expr(...)[0]["cell"]` yields, computed as
    one Arrow-batched int64 matrix multiply instead of an inlined
    literal expression tree.

    Both forms are EXACT integer arithmetic (|dot| ≪ 2^63), so they are
    bit-identical — asserted against each other in tests — and numpy's
    argmax picks the first (lowest-index) maximum, matching the
    expression form's (neg_dot, cell) ascending sort. The expression
    form inlines cells·dim literals into the generated code, which is
    fine for a 16-cell oracle-checked quantizer but explodes at the
    100 TB sizing rule (cells ∝ corpus); this form ships one (cells ×
    dim) int64 matrix to each task and pays a BLAS-shaped batch matmul
    per Arrow batch.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=np.int64)

    @pandas_udf("int")
    def assign(batch: pd.Series) -> pd.Series:
        if batch.empty:
            return pd.Series([], dtype="int32")
        m = np.stack(batch.to_numpy()).astype(np.int64, copy=False)
        return pd.Series(np.argmax(m @ cmat.T, axis=1).astype(np.int32))

    return assign(qv)


def _top_cell_expr(qv, centroids: list[list[int]]):
    """Top-cell assignment, auto-switching representation: the
    inlined-literal expression below `_ARROW_ASSIGN_CELLS` cells (pure
    JVM, oracle-replayable at catalog sizes), the Arrow int64 matmul
    above it (identical values, scales in cell count)."""
    if len(centroids) > _ARROW_ASSIGN_CELLS:
        return _int_cell_assign_arrow(qv, centroids)
    return _int_cell_rank_expr(qv, centroids)[0]["cell"]


def ivf_topk_portable(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    quant: int = 1000,
    train_on: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k with the portable seed quantizer: every branch of the
    pipeline (centroid selection, cell assignment, probe ranking) is
    exact integer / hash arithmetic a SQL oracle can replay, and only
    the final cosine scores are floats (rounded to 4 decimals by the
    shared `_topk_per_query` tail, same as every sim query).

    Same plan shape as `ivf_topk`: one corpus pass to assign, probed
    queries broadcast, per-query top-k window — so verifying THIS
    variant value-for-value also exercises the join/score/rank tail the
    headline k-means variant shares (`_score_probed`).
    """
    cents = ivf_portable_seed_centroids(
        corpus if train_on is None else train_on,
        id_col, vec_col, n_centroids, quant,
    )
    if not cents:
        return ivf_assign(corpus, [], id_col, vec_col).select(
            F.col("neighbor_id").alias("query_id"),
            "neighbor_id",
            F.lit(0).alias("rank"),
            F.lit(None).cast("double").alias("cosine"),
        )
    live = F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    ranked = _int_cell_rank_expr(
        quantize_expr(F.col(vec_col), quant), cents
    )
    assigned = corpus.where(live).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
        _top_cell_expr(quantize_expr(F.col(vec_col), quant), cents).alias(
            "cell"
        ),
    )
    q = queries.where(live).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
        F.explode(
            F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cell"])
        ).alias("cell"),
    )
    return _score_probed(assigned, q, k)


def semantic_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
    quant: int = 1000,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al.,
    arXiv:2303.09540): cluster embeddings with the coarse quantizer,
    compare pairs only WITHIN a cell, keep cosine ≥ threshold.

    The relational form of the paper's k-means + within-cluster
    pairwise screen: cell assignment is one corpus pass (no shuffle of
    pair space), the pair join is cell-blocked — candidate volume is
    Σ cell_size², never corpus² — and raising `n_centroids` shrinks
    cells (the paper's k ≈ corpus/10k rule). Uses the PORTABLE seed
    quantizer (`ivf_portable_seed_centroids`) so cell assignment is
    exact integer arithmetic and the whole pipeline — centroids,
    assignment, pair generation, cosine screen — replays in the DuckDB
    oracle (`dedup_semantic`). Emits (id_a < id_b, cosine) edges;
    feed operators/graph.cluster_assignment for canonical keepers,
    exactly like the Jaccard pair family.
    """
    cents = ivf_portable_seed_centroids(
        corpus, id_col, vec_col, n_centroids, quant
    )
    live = F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    if not cents:
        return corpus.where(F.lit(False)).select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(None).cast("double").alias("cosine"),
        )
    # Norms are per-ROW, computed before the join: inlining cosine_expr
    # after the join would re-evaluate each side's norm once per PAIR —
    # 3 array aggregates per pair instead of 1 (measured 1.9×: 7.5 s →
    # 4.0 s at sf0.1). Values are bit-identical (same expression over
    # the same row).
    #
    # ensure_parallelism: the cell join broadcasts the small side, so
    # the B² pair explosion executes in the PROBE side's partitions —
    # and a compact corpus arrives as one input split (AQE's byte-based
    # sizing can't see that join OUTPUT ≫ join input here), serializing
    # the whole screen on one core. Widening the probe side spread it
    # over the cluster: measured 4.4 s → 2.8 s at sf0.1, identical
    # rows; no-op when the input is already wide (the 100 TB case).
    assigned = ensure_parallelism(corpus.where(live)).select(
        F.col(id_col).alias("vid"),
        _as_double(F.col(vec_col)).alias("v"),
        _top_cell_expr(quantize_expr(F.col(vec_col), quant), cents).alias(
            "cell"
        ),
    ).withColumn("nrm", norm_expr(F.col("v")))
    a = assigned.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "cell",
    )
    b = assigned.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "cell",
    )
    denom = F.col("na") * F.col("nb")
    return (
        a.join(b, ["cell"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            # Same NULL-for-zero-norm contract as cosine_expr.
            F.when(
                denom != 0, dot_expr(F.col("va"), F.col("vb")) / denom
            ).alias("cosine_raw"),
        )
        .where(F.col("cosine_raw") >= F.lit(float(threshold)))
        .select("id_a", "id_b", round_det("cosine_raw", 4).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-code ANN
# ---------------------------------------------------------------------------


def pq_codebooks_portable(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    quant: int = 1000,
) -> list[list[list[int]]]:
    """codebooks[s][j] = integer-quantized codeword j of subspace s —
    the portable-seed PQ codebook (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI'11 / the FAISS PQ shape).

    The seed set is the same md5-ordered top-ksub selection the
    portable IVF quantizer uses (`ivf_portable_seed_centroids`), sliced
    into m contiguous sub-vectors: deterministic, one bounded corpus
    top-k, and exactly re-derivable in SQL — so encoding AND scoring
    are oracle-checkable end to end. Production would run per-subspace
    k-means on a sample instead (swap this function; everything
    downstream is codebook-agnostic).
    """
    seeds = ivf_portable_seed_centroids(corpus, id_col, vec_col, ksub, quant)
    if not seeds:
        return []
    dim = len(seeds[0])
    sub = dim // m
    assert sub * m == dim, f"dim {dim} not divisible by m={m}"
    return [
        [seed[s * sub : (s + 1) * sub] for seed in seeds] for s in range(m)
    ]


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1000,
    extra: dict | None = None,
) -> DataFrame:
    """(id, codes array<int>[m]) — each vector compressed to m nibble
    codes: per subspace, the codeword minimizing EXACT integer squared
    L2 distance to the quantized sub-vector (lowest code on ties).
    m=8 × ksub=16 → 8 codes of 4 bits: a 64-dim float vector becomes
    ~4 bytes of index payload — the memory trade that makes
    billion-vector serving fit on a cluster.
    """
    live = F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    if _pq_is_int_family(codebooks):
        vv = quantize_expr(F.col(vec_col), quant)
    else:  # trained float codebooks — same shape, float arithmetic
        vv = _as_double(F.col(vec_col))

    # `extra` carries additional per-row expressions through the same
    # pass (e.g. the IVF cell in ivfpq_topk) — one corpus scan instead
    # of a self-join that would re-execute the encoding pipeline.
    # Single-parse SQL for the m×ksub distance tower (r13 idiom): the
    # Column-API form paid thousands of py4j round-trips PER CALL
    # (~6-8 s of driver time for the trained ksub=64 family) to build
    # an expression the parser assembles from one string in tens of
    # ms. The staged `__vv` projection also guarantees the quantized
    # vector is derived once per row regardless of how many subspace
    # slices reference it.
    staged = corpus.where(live).select(
        F.col(id_col).alias("neighbor_id"),
        vv.alias("__vv"),
        *[expr.alias(name) for name, expr in (extra or {}).items()],
    )
    return staged.select(
        "neighbor_id",
        F.expr(_pq_codes_sql(codebooks)).alias("codes"),
        *[F.col(name) for name in (extra or {})],
    )


def _sql_num(c, int_family: bool) -> str:
    """A codeword component as a SQL literal of the SAME type the
    Column form produced: BIGINT for the portable int family (so the
    (a-b)*(a-b) arithmetic stays integer-exact), shortest-round-trip
    double otherwise."""
    return f"{int(c)}L" if int_family else repr(float(c)) + "D"


def _pq_codes_sql(codebooks) -> str:
    """SQL for the m nibble codes over a staged `__vv` column —
    argmin-by-(distance, index) per subspace, lowest code on ties
    (array_sort over (d, j) structs, exactly the Column form's
    ranking)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    int_family = _pq_is_int_family(codebooks)
    zero = "CAST(0 AS BIGINT)" if int_family else "0.0D"
    codes = []
    for s in range(m):
        sub_v = f"slice(__vv, {s * sub + 1}, {sub})"
        dists = ", ".join(
            f"aggregate(zip_with({sub_v}, array("
            + ", ".join(_sql_num(c, int_family) for c in cw)
            + f"), (a, b) -> (a - b) * (a - b)), {zero}, (acc, x) -> acc + x)"
            for cw in codebooks[s]
        )
        codes.append(
            f"array_sort(transform(array({dists}), (d, j) ->"
            " named_struct('d', d, 'j', CAST(j AS INT))))[0].j"
        )
    return f"array({', '.join(codes)})"


def _pq_lut_sql(codebooks, quant: int) -> str:
    """SQL for the per-query m×ksub dot-product LUT over a staged
    `__qf` (double) column — same left-fold dot as `dot_expr`, double
    literals precomputed in Python exactly as the Column form's
    F.lit(c / quant) did."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    int_family = _pq_is_int_family(codebooks)
    rows = []
    for s in range(m):
        sub_q = f"slice(__qf, {s * sub + 1}, {sub})"
        dots = ", ".join(
            f"aggregate(zip_with({sub_q}, array("
            + ", ".join(
                repr(float(c / float(quant) if int_family else c)) + "D"
                for c in cw
            )
            + "), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
            for cw in codebooks[s]
        )
        rows.append(f"array({dots})")
    return f"array({', '.join(rows)})"


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    quant: int = 1000,
    codebooks: list | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """Asymmetric-distance PQ top-k: corpus vectors are scored through
    their codes only — score(q, x) ≈ Σ_s LUT_q[s][codes_x[s]], where
    LUT_q[s][j] = dot(q_s, codeword_sj) is a per-query m×ksub table.

    Plan shape: codes are one narrow corpus pass (the scan that would
    read 4-byte payloads from a code table at scale); queries carry
    their LUTs as in-row arrays and are BROADCAST, so scoring is an
    in-row fold per (query, code-row) pair — no shuffle until the final
    per-query top-k window. Ranking is on the 4-decimal-rounded score
    (deterministic across engines; ties break on neighbor id). Compose
    with the IVF cell filter for IVF-PQ (score only probed cells).

    `codebooks` defaults to the portable seed family (oracle-checkable,
    modest recall); pass `pq_train_codebooks(...)` for the production
    per-subspace k-means family. `rerank=R` adds the FAISS two-stage
    serving shape: PQ shortlists the top R per query, then the exact
    cosine re-ranks only those ≤ queries×R rows (`pq_rerank_exact`) —
    measured recall at sf0.001 rises from 0.32 (trained, ksub=16,
    codes-only) to 0.74 (trained, ksub=64, rerank=20).
    """
    if codebooks is None:
        codebooks = pq_codebooks_portable(
            corpus, id_col, vec_col, m, ksub, quant
        )
    if not codebooks:
        return corpus.where(F.lit(False)).select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0).alias("rank"),
            F.lit(None).cast("double").alias("score"),
        )
    codes = pq_encode(corpus, codebooks, id_col, vec_col, quant)
    live = F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    qf = _as_double(F.col(vec_col))
    q = queries.where(live).select(
        F.col(id_col).alias("query_id"), qf.alias("__qf")
    ).select(
        "query_id",
        F.expr(_pq_lut_sql(codebooks, quant)).alias("lut"),
        F.col("__qf").alias("q_vec"),
    )
    score = F.aggregate(
        F.zip_with(
            F.col("lut"),
            F.col("codes"),
            lambda row, c: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_det(score, 4).alias("score"),
            "q_vec",
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    topped = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= (rerank if rerank else k))
    )
    if rerank:
        return pq_rerank_exact(corpus, topped, id_col, vec_col, k)
    return topped.select("query_id", "neighbor_id", "rank", "score")


def pq_train_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    sample_size: int = 4096,
    iters: int = 8,
) -> list[list[list[float]]]:
    """Production PQ codebooks: per-subspace L2 k-means over the same
    bounded, hash-selected corpus sample `train_ivf_centroids` uses
    (one corpus top-k, driver transfer ≤ sample_size rows), with the
    deterministic farthest-first init — no RNG anywhere. Returns FLOAT
    codewords; `pq_encode`/`pq_topk` accept either family (trained
    floats for recall, portable ints for oracle replay — same split as
    the IVF quantizer)."""
    import numpy as np

    sample = (
        corpus.select(_as_double(F.col(vec_col)).alias("v"))
        .where(F.size("v") > 0)
        .orderBy(F.xxhash64(F.col("v")))
        .limit(sample_size)
        .collect()
    )
    if not sample:
        return []
    x = np.array([r.v for r in sample], dtype=np.float64)
    dim = x.shape[1]
    sub = dim // m
    assert sub * m == dim, f"dim {dim} not divisible by m={m}"
    books: list[list[list[float]]] = []
    for s in range(m):
        sx = x[:, s * sub : (s + 1) * sub]
        k_eff = min(ksub, len(sx))
        chosen = [0]
        d = np.linalg.norm(sx - sx[0], axis=1)
        for _ in range(1, k_eff):
            nxt = int(d.argmax())
            chosen.append(nxt)
            d = np.minimum(d, np.linalg.norm(sx - sx[nxt], axis=1))
        c = sx[chosen].copy()
        for _ in range(iters):
            assign = ((sx[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(1)
            for j in range(len(c)):
                members = sx[assign == j]
                if len(members):
                    c[j] = members.mean(0)
        books.append(c.tolist())
    return books


def _pq_is_int_family(codebooks) -> bool:
    return isinstance(codebooks[0][0][0], int)


def pq_rerank_exact(
    corpus: DataFrame,
    shortlist: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact-cosine re-rank of a PQ shortlist (the FAISS two-stage
    serving shape): the shortlist — queries × R (query_id, neighbor_id)
    pairs — is BROADCAST against the corpus, so full vectors are read
    only for shortlisted ids and the exact cosine runs on ≤ queries×R
    rows. Expects the shortlist to carry `q_vec` (the query vectors)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
    )
    scored = c.join(
        F.broadcast(shortlist.select("query_id", "neighbor_id", "q_vec")),
        "neighbor_id",
    ).select(
        "query_id",
        "neighbor_id",
        cosine_expr(F.col("q_vec"), F.col("c_vec")).alias("cosine_raw"),
    )
    return _topk_per_query(scored, k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    n_centroids: int = 16,
    nprobe: int = 4,
    quant: int = 1000,
    codebooks: list | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """IVF-PQ: the full FAISS serving composition — coarse quantizer
    prunes to `nprobe` cells per query, PQ codes score ONLY the
    surviving cells' rows, optional exact re-rank of the shortlist.

    Per-query cost ≈ (nprobe/n_centroids) × corpus CODE rows (4-byte
    payloads, not 256-byte vectors) + R full-vector reads when
    reranking — the shape that serves billions of vectors. Cell
    assignment and probe ranking reuse the portable seed quantizer
    verbatim (`_int_cell_rank_expr`), so with the default portable
    codebooks every discrete branch is the one the oracle-checked
    sim_ivf_topk_portable / sim_pq_topk queries already verify; with
    nprobe == n_centroids this reduces exactly to `pq_topk` (asserted
    in tests).
    """
    cents = ivf_portable_seed_centroids(
        corpus, id_col, vec_col, n_centroids, quant
    )
    if codebooks is None:
        codebooks = pq_codebooks_portable(
            corpus, id_col, vec_col, m, ksub, quant
        )
    if not cents or not codebooks:
        return corpus.where(F.lit(False)).select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0).cast("int").alias("rank"),
            F.lit(None).cast("double").alias("score"),
        )
    live = F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    ranked = _int_cell_rank_expr(quantize_expr(F.col(vec_col), quant), cents)
    codes = pq_encode(
        corpus, codebooks, id_col, vec_col, quant,
        extra={"cell": ranked[0]["cell"]},
    )
    qf = _as_double(F.col(vec_col))
    q = queries.where(live).select(
        F.col(id_col).alias("query_id"),
        qf.alias("__qf"),
        F.explode(
            F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cell"])
        ).alias("cell"),
    ).select(
        "query_id",
        F.expr(_pq_lut_sql(codebooks, quant)).alias("lut"),
        F.col("__qf").alias("q_vec"),
        "cell",
    )
    score = F.aggregate(
        F.zip_with(
            F.col("lut"),
            F.col("codes"),
            lambda row, c: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        codes.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_det(score, 4).alias("score"),
            "q_vec",
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    topped = scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= (rerank if rerank else k))
    if rerank:
        return pq_rerank_exact(corpus, topped, id_col, vec_col, k)
    return topped.select("query_id", "neighbor_id", "rank", "score")


def rp_distortion(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    table: int = 7,
) -> DataFrame:
    """Johnson-Lindenstrauss random-projection DISTORTION contract:
    for consecutive-id vector pairs, the squared L2 distance in the
    k=``n_planes``-dimensional md5-portable projection (the same
    integer plane family the LSH bucketer uses, `md5_int_planes`)
    versus the true squared distance — the "pairwise distances survive
    projection" guarantee a 100 TB user relies on when they shrink
    embeddings before ANN, measured as rows instead of cited as a
    theorem (the minhash_estimate_error idiom, applied to JL).

    INTEGER-EXACT cross-engine: vectors quantize to BIGINT once
    (floor(v*1000+0.5), the portable-LSH rule), plane components are
    md5-derived integers, every dot/square runs in BIGINT/DECIMAL(38)
    (HUGEINT in the oracle), and the reported ratio is one scaled
    integer division — no float sum whose ordering could flip a
    rounding. est/true ratio estimator: ``ratio_scaled =
    (proj_d2 * dim * 10^4) div (S_total * true_d2)`` with S_total =
    sum of ALL plane components squared (so proj_d2/(k*sigma^2) in
    exact arithmetic); 10^4 = 1.0. ``within_band`` flags ratio in
    [0.5, 2.0] — k=16 concentrates to ~±2*sqrt(2/k)≈0.7, so the band
    holds for the vast majority of pairs and a broken projection
    (wrong planes, dropped dims) floods it with zeros.

    Scale shape: map-only per-pair arithmetic after ONE sorted
    equi-self-join on (id, id+1); the plane table rides in the plan as
    literals (bounded by k*dim)."""
    planes = md5_int_planes(dim=64, n_planes=n_planes, table=table)
    s_total = sum(c * c for p in planes for c in p)
    dim = len(planes[0])

    qv = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * 1000 + F.lit(0.5)).cast("long"),
    )
    base = emb.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    ).select(F.col(id_col), qv.alias("qv"))
    a = base.select(
        F.col(id_col).alias("vec_id_a"), F.col("qv").alias("qa")
    )
    b = base.select(
        (F.col(id_col) - 1).alias("vec_id_a"),
        F.col(id_col).alias("vec_id_b"),
        F.col("qv").alias("qb"),
    )
    pairs = a.join(b, "vec_id_a")
    dq = F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x - y)
    pairs = pairs.select(
        "vec_id_a", "vec_id_b", dq.alias("dq")
    )
    true_d2 = F.aggregate(
        F.col("dq"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )

    def dr(p: list[int]):
        lit = F.array(*[F.lit(c).cast("long") for c in p])
        return F.aggregate(
            F.zip_with(F.col("dq"), lit, lambda x, c: x * c),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    proj = None
    for p in planes:
        sq = (dr(p).cast("decimal(38,0)")) * (dr(p).cast("decimal(38,0)"))
        proj = sq if proj is None else proj + sq
    out = pairs.select(
        "vec_id_a",
        "vec_id_b",
        true_d2.alias("true_d2"),
        proj.alias("__proj"),
    ).select(
        "vec_id_a",
        "vec_id_b",
        "true_d2",
        F.when(
            F.col("true_d2") > 0,
            F.expr(
                f"CAST((__proj * {dim * 10000}) div "
                f"(CAST({s_total} AS DECIMAL(38,0)) * true_d2) AS BIGINT)"
            ),
        ).alias("ratio_scaled"),
    )
    return out.select(
        "vec_id_a",
        "vec_id_b",
        "true_d2",
        "ratio_scaled",
        F.when(
            F.col("ratio_scaled").isNotNull()
            & (F.col("ratio_scaled") >= 5000)
            & (F.col("ratio_scaled") <= 20000),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("within_band"),
    )
