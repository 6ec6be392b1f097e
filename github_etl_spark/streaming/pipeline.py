"""Micro-batch pipeline (SURVEY.md §2.9 T1/T4, §7.1 M4).

The reference's driver loop is a pull-based micro-batch pipeline:
generator yields a ≤100-PR chunk → transform → load → next chunk
(main.py:871-895), with idempotent recovery via probe+delete per
`(repo, snapshot_date)` (main.py:829-839). Structured Streaming's
`foreachBatch` is the exact engine-native analog: bounded memory per
micro-batch, sink-side idempotence via the snapshot writer, and
checkpointed offsets replacing the reference's "re-run the whole day"
recovery story with exactly-once per batch.

Two entry points:
- `run_batch`: the whole DAG as one batch job (connector scan →
  transform → dynamic-partition-overwrite load). The reference's
  `_main` shape.
- `stream_landing`: landing-zone streaming — enriched-PR JSON files
  land in a directory; each micro-batch is transformed and appended to
  the four tables. `trigger(availableNow=True)` drains the backlog and
  stops, giving the reference's chunked batch semantics with streaming
  machinery (checkpoint = resumability).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..etl.transform import RAW_PR_SCHEMA, transform
from ..sinks.snapshot import SnapshotSink, stamp


def run_batch(
    spark: SparkSession,
    repos: list[str],
    api_url: str,
    sink_base: str,
    snapshot_date: str | _dt.date,
    per_page: int = 100,
    force: bool = False,
    token: str | None = None,
) -> SnapshotSink:
    """Full ETL for each repo: scan → transform → idempotent load.

    Mirrors the reference driver (main.py:829-895): skip a repo whose
    snapshot already exists unless `force` — with dynamic partition
    overwrite the skip is an optimization, not a correctness need.
    """
    from ..sources.github import register

    register(spark)
    sink = SnapshotSink(sink_base)
    for repo in repos:
        if not force and sink.exists(spark, repo, snapshot_date):
            continue
        reader = (
            spark.read.format("github")
            .option("repo", repo)
            .option("url", api_url)
            .option("per_page", str(per_page))
            .option("state", "all")
        )
        if token:
            reader = reader.option("token", token)
        # One API scan feeds all four tables: without the persist, each
        # table's take(1) + write re-executes the whole custom-source
        # read (~8 scans), racing upstream changes into inconsistent
        # tables and multiplying the rate-limit spend.
        prs = reader.load().persist()
        try:
            prs.count()  # materialize the scan once
            sink.load(transform(prs, repo), repo, snapshot_date)
        finally:
            prs.unpersist()
    return sink


def _make_batch_loader(sink_base: str, repo: str, snapshot_date: str | _dt.date):
    """foreachBatch body shared by the streaming pipelines: transform +
    stamp + per-`ingest_batch` dynamic partition overwrite (idempotent
    under batch replay). The batch is persisted once so the four table
    writes don't each re-read the micro-batch's input; no take(1)
    guard — an empty frame under dynamic overwrite touches nothing."""

    def _load_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for name, df in transform(batch_df, repo).items():
                out = stamp(df, repo, snapshot_date).withColumn(
                    "ingest_batch", F.lit(batch_id)
                )
                (
                    out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("target_repository", "snapshot_date", "ingest_batch")
                    .parquet(os.path.join(sink_base, name))
                )
        finally:
            batch_df.unpersist()

    return _load_batch


def stream_landing(
    spark: SparkSession,
    landing_dir: str,
    repo: str,
    sink_base: str,
    snapshot_date: str | _dt.date,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Streaming ingest of enriched-PR JSON files → four snapshot tables.

    `foreachBatch` writes each micro-batch (S7's streaming-insert
    analog) into a per-batch sub-partition with dynamic partition
    overwrite: `foreachBatch` alone is only at-least-once (a crash
    between the table write and the checkpoint commit replays the
    batch), but since batch N always overwrites exactly partition
    `ingest_batch=N`, the replay is idempotent — effective
    exactly-once without a transactional table format.
    `maxFilesPerTrigger` is the chunk-size knob (the reference's
    100-PR chunk, main.py:875); compaction
    (`sinks.snapshot.compact_snapshot`) later collapses the per-batch
    dirs.
    """
    sink = SnapshotSink(sink_base)

    reader = spark.readStream.schema(RAW_PR_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(landing_dir)

    writer = (
        stream.writeStream.foreachBatch(
            _make_batch_loader(sink_base, repo, snapshot_date)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query, sink


def stream_github(
    spark: SparkSession,
    repo: str,
    api_url: str,
    sink_base: str,
    snapshot_date: str | _dt.date,
    checkpoint_dir: str,
    token: str | None = None,
    with_children: bool = True,
    available_now: bool = False,
):
    """LIVE end-to-end ETL: streaming GitHub source → transform →
    per-batch append into the four snapshot tables.

    The full reference DAG as one continuous query: the source's
    PR-number cursor (sources.github.GithubStreamReader) resumes after
    a crash instead of refetching the day, and each batch overwrites
    its own `ingest_batch` partition (dynamic overwrite), so batch
    replay is idempotent — effective exactly-once end to end, strictly
    better than the reference's probe→delete→reload recovery. Run
    compaction (`sinks.snapshot.compact_snapshot`) when the date
    closes.
    """
    from ..sources.github import register

    register(spark)
    reader = (
        spark.readStream.format("github")
        .option("repo", repo)
        .option("url", api_url)
        .option("state", "all")
        .option("with_children", "true" if with_children else "false")
    )
    if token:
        reader = reader.option("token", token)
    stream = reader.load()

    writer = (
        stream.writeStream.foreachBatch(
            _make_batch_loader(sink_base, repo, snapshot_date)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), SnapshotSink(sink_base)
