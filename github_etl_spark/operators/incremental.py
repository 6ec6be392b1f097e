"""Incremental dedup: check an ingest batch against a corpus index
(EXT — the 100 TB crawl-dedup shape; generalizes the reference's
existence-probe-before-load idempotency, reference main.py:573-601,
from partitions to documents).

At 100 TB you never re-dedup the whole corpus per ingest batch. The
corpus is summarized ONCE into two compact relations:

- a **fingerprint store** — one md5 set-hash per document
  (`fingerprint_expr`: casing/order/punctuation-invariant), and
- a **band-bucket store** — the MinHash LSH bucket relation
  (`minhash_band_buckets`), one row per document × band.

Each new batch is then classified against the stores with the BATCH
side broadcast: the store relations are scanned but never shuffled, so
per-ingest cost is one pass over each store plus work proportional to
the batch. Survivors append their own fingerprints/buckets, keeping
the index current without rebuilds.

Verdicts per batch document:

- ``exact_dup``  — fingerprint already in the corpus store;
- ``near_dup``   — shares an LSH band bucket with a corpus doc whose
  signature agreement ≥ threshold (exact-dup wins when both hold);
- ``new``        — neither (including short/empty docs that produce no
  shingles: they can't near-dup under the MinHash family, mirroring
  `minhash_signatures`).

With ``hash_family="md5_portable"`` every step is replayable in SQL,
so the whole batch-vs-corpus check is oracle-verified value-for-value
(`dedup_incremental` in plans/ext.py). Skew: the probe side of both
joins is the (small) batch, so a hot bucket costs store_bucket_size ×
batch_bucket_size rows — bounded by the batch; the build path
additionally applies the same deterministic `max_bucket_size` cap as
`minhash_lsh_candidates` so no store bucket is unbounded either.

Crash consistency: `dedup_index_build` stamps a JSON meta sidecar
(hash parameters) that `dedup_index_check`/`dedup_index_append` reuse,
so check-time parameters cannot drift from build-time. Both stores are
partitioned by an `ingest_batch` column (build writes batch −1): a
streaming ingest passes its micro-batch id to `dedup_index_append`,
which then DYNAMIC-OVERWRITES exactly partition `ingest_batch=N` —
replaying a crashed batch rewrites its own store partition instead of
double-appending, and `dedup_index_check(..., exclude_batch=N)` masks
the failed attempt's rows so replayed verdicts are identical to the
first attempt's (see streaming/dedup_gate.py for the full exactly-once
argument). Batch-less appends land in partition −1 with plain append
semantics; wrap those in the snapshot transaction log (sinks/txnlog.py)
where a reader racing a crashed append matters.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint_expr
from .dedup import minhash_band_buckets, signature_agreement_expr

_META_SUFFIX = "_meta"
_DEFAULT_META = {
    "num_hashes": 32,
    "bands": 8,
    "shingle": 3,
    "hash_family": "xxhash64",
    "max_bucket_size": 64,
}


def _fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        fingerprint_expr(F.col(text_col)).alias("fingerprint"),
    )


def _verdicts(
    batch: DataFrame,
    batch_fp: DataFrame,
    batch_bands: DataFrame,
    corpus_fp: DataFrame,
    corpus_bands: DataFrame,
    id_col: str,
    num_hashes: int,
    threshold: float,
) -> DataFrame:
    """Shared classification core for the inline and materialized
    paths (so the two cannot diverge; the index roundtrip test asserts
    exact equality).

    Both joins broadcast the BATCH side: the corpus stores are scanned,
    never shuffled — the property that makes per-batch cost independent
    of corpus size (modulo the scan).
    """
    exact = (
        corpus_fp.select("fingerprint")
        .join(F.broadcast(batch_fp), "fingerprint")
        .select(F.col("doc"))
        .distinct()
        .withColumn("_exact", F.lit(True))
    )
    cand = (
        corpus_bands.select(
            F.col("doc").alias("corpus_doc"),
            F.col("signature").alias("sig_c"),
            "band",
            "bucket",
        )
        .join(
            F.broadcast(
                batch_bands.select(
                    F.col("doc").alias("batch_doc"),
                    F.col("signature").alias("sig_b"),
                    "band",
                    "bucket",
                )
            ),
            ["band", "bucket"],
        )
        # A pair colliding in several bands is one candidate; signatures
        # are per-doc constants, so the kept row is value-deterministic.
        .dropDuplicates(["batch_doc", "corpus_doc"])
    )
    near = (
        cand.where(
            signature_agreement_expr("sig_b", "sig_c", num_hashes)
            >= F.lit(float(threshold))
        )
        .groupBy("batch_doc")
        .agg(F.count("*").alias("n_near"))
    )
    return (
        batch.select(F.col(id_col))
        .join(exact, F.col(id_col) == exact["doc"], "left")
        .join(near, F.col(id_col) == near["batch_doc"], "left")
        .select(
            F.col(id_col),
            F.when(F.col("_exact"), F.lit("exact_dup"))
            .when(F.col("n_near") > 0, F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near"),
        )
    )


def incremental_dedup_verdicts(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
    threshold: float = 0.5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Inline batch-vs-corpus dedup check (corpus relations computed on
    the fly). One row per batch document: (id, verdict, n_near).

    `n_near` counts distinct corpus docs that are LSH candidates with
    signature agreement ≥ threshold — reported for every doc (even
    exact dups) so the output is a pure function of the inputs.
    Corpus/batch ids are assumed disjoint (they are different tables in
    any real ingest); overlapping ids would self-match.
    """
    corpus_fp = _fingerprints(corpus, text_col, id_col)
    batch_fp = _fingerprints(batch, text_col, id_col)
    corpus_bands = minhash_band_buckets(
        corpus, text_col, id_col, num_hashes, bands, shingle, hash_family
    )
    batch_bands = minhash_band_buckets(
        batch, text_col, id_col, num_hashes, bands, shingle, hash_family
    )
    return _verdicts(
        batch, batch_fp, batch_bands, corpus_fp, corpus_bands,
        id_col, num_hashes, threshold,
    )


def _capped_bands(bands_df: DataFrame, max_bucket_size: int) -> DataFrame:
    """Deterministic first-N members per (band, bucket) — the same skew
    cap `minhash_lsh_candidates` applies, so no store bucket is ever
    unbounded (a boilerplate bucket's overflow members are mutual
    near-dups of the kept ones; recall cost is negligible)."""
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("band", "bucket").orderBy("doc")
    )
    return (
        bands_df.withColumn("_rn", rn)
        .filter(F.col("_rn") <= max_bucket_size)
        .drop("_rn")
    )


def dedup_index_build(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
    hash_family: str = "xxhash64",
    max_bucket_size: int = 64,
) -> None:
    """Materialize the dedup index: fingerprint store at
    `{path}/fingerprints`, band-bucket store at `{path}/bands`, hash
    parameters at `{path}_meta` (one-line JSON via the Spark text
    writer — works on any supported filesystem).

    The meta sidecar is written FIRST: a crash mid-build leaves stores
    that `dedup_index_check` reads with the right parameters (possibly
    incomplete — rebuild), never stores silently probed with the wrong
    hash family.
    """
    spark = corpus.sparkSession
    meta = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle": shingle,
        "hash_family": hash_family,
        "max_bucket_size": max_bucket_size,
    }
    spark.createDataFrame(
        [(json.dumps(meta),)], "value string"
    ).coalesce(1).write.mode("overwrite").text(path + _META_SUFFIX)
    _fingerprints(corpus, text_col, id_col).withColumn(
        "ingest_batch", F.lit(-1).cast("long")
    ).write.mode("overwrite").partitionBy("ingest_batch").parquet(
        f"{path}/fingerprints"
    )
    bands_df = minhash_band_buckets(
        corpus, text_col, id_col, num_hashes, bands, shingle, hash_family
    )
    _capped_bands(bands_df, max_bucket_size).withColumn(
        "ingest_batch", F.lit(-1).cast("long")
    ).write.mode("overwrite").partitionBy("ingest_batch").parquet(
        f"{path}/bands"
    )


def _read_meta(spark: SparkSession, path: str) -> dict:
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.text(path + _META_SUFFIX).head()
    except AnalysisException:  # path missing entirely
        row = None
    if row is None or not row[0]:
        raise ValueError(
            f"dedup index at {path!r} has no meta sidecar at "
            f"{path + _META_SUFFIX!r} — incomplete build? Rebuild with "
            "dedup_index_build."
        )
    return {**_DEFAULT_META, **json.loads(row[0])}


def dedup_index_check(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    exclude_batch: int | None = None,
) -> DataFrame:
    """Classify a batch against a materialized index. Hash parameters
    come from the index's meta sidecar — check-time code cannot drift
    from build-time bucketing.

    `exclude_batch` masks store rows from one `ingest_batch` partition
    (a partition-pruned filter, not a scan): a replayed streaming batch
    excludes its OWN id so a prior crashed attempt's half-published
    rows can't flip its verdicts (streaming/dedup_gate.py).
    """
    meta = _read_meta(spark, path)
    corpus_fp = spark.read.parquet(f"{path}/fingerprints")
    corpus_bands = spark.read.parquet(f"{path}/bands")
    if exclude_batch is not None:
        corpus_fp = corpus_fp.where(F.col("ingest_batch") != exclude_batch)
        corpus_bands = corpus_bands.where(
            F.col("ingest_batch") != exclude_batch
        )
    batch_fp = _fingerprints(batch, text_col, id_col)
    batch_bands = minhash_band_buckets(
        batch, text_col, id_col,
        meta["num_hashes"], meta["bands"], meta["shingle"],
        meta["hash_family"],
    )
    return _verdicts(
        batch, batch_fp, batch_bands, corpus_fp, corpus_bands,
        id_col, meta["num_hashes"], threshold,
    )


def dedup_index_append(
    spark: SparkSession,
    path: str,
    survivors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ingest_batch: int | None = None,
) -> None:
    """Append surviving (verdict == 'new') documents to both stores so
    the next batch dedups against them.

    With an `ingest_batch` id the write DYNAMIC-OVERWRITES exactly the
    `ingest_batch=N` partition of each store — a replayed streaming
    batch republishes its own partition instead of double-appending
    (idempotent under foreachBatch's at-least-once delivery). Without
    one, rows land in the build partition (−1) with plain append
    semantics — wrap in the snapshot transaction log (sinks/txnlog.py)
    where a reader racing a crashed append matters. The append is NOT
    re-capped: a cap is a per-build bound; appended buckets stay
    bounded because survivors are, by definition, not near-dups of
    existing members.
    """
    meta = _read_meta(spark, path)
    batch_id = -1 if ingest_batch is None else int(ingest_batch)
    mode = "append" if ingest_batch is None else "overwrite"

    def _write(df: DataFrame, sub: str) -> None:
        (
            df.withColumn("ingest_batch", F.lit(batch_id).cast("long"))
            .write.mode(mode)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(f"{path}/{sub}")
        )

    _write(_fingerprints(survivors, text_col, id_col), "fingerprints")
    _write(
        minhash_band_buckets(
            survivors, text_col, id_col,
            meta["num_hashes"], meta["bands"], meta["shingle"],
            meta["hash_family"],
        ),
        "bands",
    )


def dedup_index_fold(spark: SparkSession, path: str) -> int:
    """Fold BOTH dedup-index stores' per-ingest partitions into one
    fresh partition each (sinks/compact.fold_partitions — write-first
    crash-safe ordering; every intermediate state is a duplicated
    superset, which the membership probe and the capped band-bucket
    candidate screen both tolerate: duplicates add candidate pairs
    that dropDuplicates collapses). The two stores fold to the SAME
    fresh id so their partition layouts stay aligned. Returns the
    total partitions folded. Run on a QUIESCED stream only — folding
    erases batch identity, so `exclude_batch` replay masking no longer
    sees a replayed batch's rows (the fold_partitions caveat).
    Verdicts are invariant under folding — pinned in
    tests/test_incremental.py."""
    from ..sinks.compact import fold_partitions, partition_stats

    _read_meta(spark, path)  # store must exist with valid params
    tables = [f"{path}/fingerprints", f"{path}/bands"]
    existing: list[int] = []
    for t in tables:
        existing += [
            int(p["partition"]["ingest_batch"]) for p in partition_stats(t)
        ]
    if not existing:
        return 0
    into = min(existing) - 1
    # Fold only when SOME table actually has partitions to
    # consolidate — but then fold BOTH tables (fold_single=True), so
    # the "same fresh id, aligned layouts" invariant in the docstring
    # holds even when one store ingested a single batch while the
    # other ingested many (ADVICE r12: the old per-table ≤1 skip let
    # fingerprints sit at batch −1 while bands folded to −2).
    per_table = {
        t: len({p["partition"]["ingest_batch"] for p in partition_stats(t)})
        for t in tables
    }
    if max(per_table.values()) <= 1:
        return 0
    n = 0
    for t in tables:
        n += len(
            fold_partitions(
                spark, t, "ingest_batch", into_value=into, fold_single=True
            )
        )
    return n
