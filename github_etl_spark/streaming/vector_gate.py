"""Streaming VECTOR-INDEX ingest gate: web-quality gate → frozen
encoder → incremental IVF append, one foreachBatch body (EXT).

The third streaming store family. The fingerprint store
(streaming/dedup_gate.py) and the span store (streaming/span_gate.py)
gate INGEST against accreted membership state; this gate maintains the
RETRIEVAL side: documents land in a directory, each micro-batch is
filtered by the combined C4-page + Gopher gate
(operators/curation.web_gate_expr), survivors are encoded by the
frozen integer linear encoder (multimodal/media.embed_text_vec — the
verified documents→embeddings derivation), and the derived vectors are
appended to the materialized IVF index with
operators/similarity.ivf_index_append — the stale-centroid regime
whose recall price `sim_ivf_append_recall` pins.

Exactly-once argument (simpler than the membership gates, and that is
the point): per-batch verdicts here depend on NOTHING accreted — the
gate is per-document, and cell assignment uses the index's FROZEN
sidecar centroids — so a replayed batch recomputes identical rows with
no own-partition exclusion mask needed. Both writes (the per-cell
admission summary, the index rows) are dynamic overwrites of the
batch's `ingest_batch=N` partitions: replay republishes, never
double-appends. Summary-first write order: if the summary row is
visible, the index rows it implies either exist or will be recreated
bit-identically by the replay.

`vector_fold_verdicts` is the DETERMINISTIC fold of the same chain
(portable md5 seed centroids over the seed corpus' derived vectors, no
disk) — the oracle-visible sibling (plans/curation.vector_gate_replay)
and the equality anchor the pytest pins the live stream against.

No reference analog (the reference is a GitHub REST ETL,
/root/reference/main.py); EXT north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.media import embed_text_vec
from ..operators.curation import web_gate_expr
from ..operators.similarity import (
    _int_cell_rank_expr,
    _read_ivf_sidecar,
    ivf_assign,
    ivf_index_append,
)
from ..session import eager_checkpoint

DOC_SCHEMA = "doc_id long, text string"

# Summary bucket for documents the web gate rejected (they never reach
# the encoder or the index).
REJECTED_CELL = -1


def make_vector_gate(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The foreachBatch body, exposed for direct (test) invocation:
    gate → encode → publish the per-(batch, cell) admission summary to
    `out_path/ingest_batch=N` → append the derived vectors to the
    index's batch-N partitions. Calling it twice with the same batch
    id must be a no-op the second time (asserted in tests).

    The sidecar is read BEFORE any publish (the span-gate lesson: a
    missing/partial index must fail loudly before durable writes, not
    after the summary is already visible)."""

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        centroids, _build = _read_ivf_sidecar(spark, index_path)
        if not centroids:
            raise ValueError(
                f"IVF index at {index_path!r} has no centroids — "
                "build it from a seed corpus before streaming appends"
            )
        batch_df.persist()
        try:
            keep = batch_df.where(web_gate_expr(F.col(text_col)))
            # Two consumers (summary assignment + index append) of the
            # encoder output → materialize once; batch-sized.
            vecs = eager_checkpoint(embed_text_vec(keep, text_col, id_col))
            n_rej = batch_df.count() - vecs.count()
            cells = (
                ivf_assign(vecs, centroids, id_col, "vec")
                .groupBy("cell")
                .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            )
            summary = cells.unionByName(
                spark.createDataFrame(
                    [(REJECTED_CELL, n_rej)], "cell int, n_docs long"
                )
            ).withColumn(
                "ingest_batch", F.lit(int(batch_id)).cast("long")
            )
            (
                summary.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(out_path)
            )
            ivf_index_append(
                spark,
                index_path,
                vecs,
                ingest_batch=int(batch_id),
                id_col=id_col,
                vec_col="vec",
            )
        finally:
            batch_df.unpersist()

    return _gate


def stream_vector_gated(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    doc_schema: str = DOC_SCHEMA,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start the gated vector-ingest stream over JSON document files;
    `trigger(availableNow=True)` drains the backlog and stops."""
    reader = spark.readStream.schema(doc_schema)
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    stream = reader.json(landing_dir)
    writer = (
        stream.writeStream.foreachBatch(
            make_vector_gate(
                spark, index_path, out_path,
                text_col=text_col, id_col=id_col,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def portable_vector_seeds(
    seed_vecs: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "vec",
    n_centroids: int = 8,
) -> list[list[int]]:
    """md5-ordered first-k DERIVED vectors as integer centroids — the
    `ivf_portable_seed_centroids` selection rule applied to
    already-integer encoder output (no quantization step needed), so
    DuckDB re-derives the same centroids from the same derivation."""
    rows = (
        seed_vecs.orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
        .limit(n_centroids)
        .collect()
    )
    return [list(r[vec_col]) for r in rows]


def vector_fold_verdicts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_centroids: int = 8,
) -> DataFrame:
    """DETERMINISTIC fold of the gate chain, no disk: seed corpus =
    gated `id % 4 == 0` documents, centroids = the portable md5 seeds
    over the seed corpus' DERIVED vectors (the frozen-centroid regime
    a built index runs in); ingest batches 1..3 = `id % 4 == b`. Per
    batch: web gate → encode → integer-dot argmax cell (ties → lowest
    cell, `_int_cell_rank_expr`), rejected documents land in cell −1.
    Emits (ingest_batch, cell, n_docs) — the same per-batch summaries
    the live gate publishes, derived as two map-only branch scans
    (kept → encode+assign, rejected → cell −1) into one bounded
    groupBy, with no per-batch loop: verdicts here depend on nothing
    accreted, which is exactly the property that makes the vector
    gate's replay story simpler than the membership gates'."""
    spark = docs.sparkSession
    seed = docs.where(
        (F.pmod(F.col(id_col), F.lit(4)) == 0)
        & web_gate_expr(F.col(text_col))
    )
    sv = eager_checkpoint(embed_text_vec(seed, text_col, id_col))
    cents = portable_vector_seeds(sv, id_col, "vec", n_centroids)
    empty = "ingest_batch long, cell int, n_docs long"
    if not cents:
        return spark.createDataFrame([], empty)
    ing = docs.where(F.pmod(F.col(id_col), F.lit(4)).isin([1, 2, 3]))
    kept = ing.where(web_gate_expr(F.col(text_col)))
    kv = eager_checkpoint(embed_text_vec(kept, text_col, id_col))
    assigned = kv.select(
        F.pmod(F.col(id_col), F.lit(4)).cast("long").alias("ingest_batch"),
        _int_cell_rank_expr(F.col("vec"), cents)[0]["cell"].alias("cell"),
    )
    rej = ing.where(~web_gate_expr(F.col(text_col))).select(
        F.pmod(F.col(id_col), F.lit(4)).cast("long").alias("ingest_batch"),
        F.lit(REJECTED_CELL).cast("int").alias("cell"),
    )
    return (
        assigned.unionByName(rej)
        .groupBy("ingest_batch", "cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
