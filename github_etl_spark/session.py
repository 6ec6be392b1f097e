"""SparkSession construction tuned for the engine.

Local-mode defaults mirror what we'd set fleet-wide on a real cluster:
AQE on (runtime coalesce + skew-join), shuffle partitions sized to the
parallelism actually available, UTC session timezone so timestamp
semantics match the DuckDB oracle and any downstream warehouse.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime confs that are safe (and desirable) to apply to an
# externally-provided session too — e.g. the driver's.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Called at the top of every public query entry point so that the
    driver-owned session gets the same semantics our own sessions do
    (most importantly UTC timestamps for oracle parity — SURVEY.md
    §7.4 risk 1).
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable in this deployment — keep going; individual
            # queries avoid depending on any single conf for correctness.
            pass
    return spark


def get_spark(app_name: str = "github_etl_spark", cpus: int | None = None) -> SparkSession:
    """Build (or get) a local session sized to this machine.

    ``SPARK_GRAFT_CPUS`` overrides parallelism (bench contract).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
