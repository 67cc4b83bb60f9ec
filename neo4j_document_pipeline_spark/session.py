"""SparkSession factory with the engine's recommended configuration.

Centralizes the scale-relevant knobs so every entry point (CLI, tests,
bench, spark-submit jobs) runs the same way:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- shuffle partitions sized to cores (local) — on a real cluster raise to
  ~2-3x total executor cores;
- Arrow-batched Python execution;
- UTC session timezone (oracle comparability, deterministic fixtures).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(master: str | None = None, app_name: str = "kg-pipeline",
                  shuffle_partitions: int | None = None,
                  driver_memory: str | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    cores_hint = master.split("[")[-1].rstrip("]")
    cores = int(cores_hint) if cores_hint.isdigit() else (os.cpu_count() or 8)
    b = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or max(8, cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # INT64 micros, not the deprecated INT96: footer min/max
        # statistics exist (manifest stats / file skipping need them) and
        # every modern reader understands them
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                driver_memory or os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
