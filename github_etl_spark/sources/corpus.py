"""JSONL corpus ingestion — the raw-crawl front door.

Web-scale training corpora arrive as JSON-Lines dumps (one document
per line, thousands of files, a tail of malformed lines from crashed
writers and encoding accidents). The 100 TB stance:

- **Explicit schema, never inference**: schema inference is a full
  extra pass over the corpus and makes the pipeline's types depend on
  whichever file sample was scanned. Callers pass the DDL.
- **Read as text, parse with the quarantine parser**: the file scan is
  `spark.read.text` (splittable, trivially parallel) and the JSON
  parsing is `functions/jsonutil.parse_json_quarantine` — malformed
  lines land in a quarantine frame with their raw bytes and source
  file instead of crashing the job (FAILFAST) or vanishing
  (DROPMALFORMED). This also sidesteps Spark's restriction on
  referencing the corrupt-record column of a direct JSON scan (which
  otherwise needs a corpus-wide cache).
- **Compression**: .gz files decode transparently but are
  NON-SPLITTABLE — one task per file, so a 10 GB .gz serializes on one
  core. Prefer many moderate files or a splittable codec (bzip2, or
  re-land as parquet/zstd on first touch); `landed` in the return
  carries `source_file` so re-landing preserves provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.jsonutil import parse_json_quarantine


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus under ``path`` with an explicit ``schema``.

    Returns ``(docs, quarantine)``:

    - ``docs``: one row per conforming line with the schema's fields
      plus ``source_file`` (provenance).
    - ``quarantine``: malformed lines — (``source_file``, ``line``) —
      for audit/replay; blank lines are dropped outright (a blank line
      is a format artifact, not data).
    """
    raw = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("source_file"),
            F.col("value").alias("line"),
        )
        .where(F.trim(F.col("line")) != "")
    )
    ok, bad = parse_json_quarantine(raw, "line", schema)
    return ok.drop("line"), bad.select(
        "source_file", F.col("line")
    )
