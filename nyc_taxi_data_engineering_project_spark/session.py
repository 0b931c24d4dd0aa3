"""SparkSession factory.

Replaces the reference's connection bootstrap (engine + readiness retry,
``python/ingest_data.py:206-221``) with a single declarative builder. The
config choices are the engine's scale posture:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast demotion/promotion) — replaces hand-tuned chunk sizes
  (``python/ingest_data.py:44``).
- ``spark.sql.session.timeZone=UTC`` + ANSI off — semantic parity with the
  reference's naive timestamps and coerce-to-null parsing
  (``python/ingest_data.py:128-129``; SURVEY.md §7.4).
- dynamic partition overwrite — idempotent month-window reload semantics
  (``python/ingest_data.py:160-166``) expressed as a write mode.
- shuffle partitions sized to the local core count; on a real cluster this
  is left to AQE coalescing from a higher initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(app_name: str = "nyc_taxi_data_engineering_project_spark",
                cpus: str | int | None = None,
                extra_conf: dict | None = None) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    Local-mode testing uses ``local[N]``; every setting below is
    cluster-safe (AQE does the runtime right-sizing at scale).
    """
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
