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
- shuffle partitions sized from the INPUT BYTES when the caller names
  the data dir (``shuffle_partitions_for``: ~32 MB of parquet per
  initial partition, core-count floor, AQE coalesces the overshoot);
  bare ``get_session()`` keeps the core-count default that fits the
  ≤sf0.1 test tier.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Initial-shuffle-partition sizing: ~32 MB of on-disk parquet per
# partition (≈100-300 MB of in-memory rows after decompression —
# comfortably inside any production executor's per-core share, and the
# ratio the K=1000 probe validated: 11 GB input / 32 MB ≈ 330 initial
# partitions vs the empirically-required 320; the sf0.1 default
# collapses to the core-count floor). Deliberately an OVERESTIMATE at
# the high end — AQE coalesces excess partitions for free at runtime,
# while an underestimate OOMs stage-level hash aggregates (SCALE.md
# §13b finding 2: 32 partitions at K=1000 is ~19 M rows/partition
# through an aggregate and dies).
_TARGET_PARTITION_BYTES = 32 << 20


def shuffle_partitions_for(data: str | int,
                           cpus: str | int | None = None) -> int:
    """Input-size-derived initial shuffle partition count.

    ``data`` is a directory of parquet tables (sizes walked on the
    driver — metadata only) or an explicit byte count. Floor = the core
    count (below it, idle cores); ceiling = none (AQE coalesces)."""
    if isinstance(data, str):
        total = 0
        for root, _dirs, files in os.walk(data):
            for f in files:
                if not f.startswith(("_", ".")):
                    total += os.path.getsize(os.path.join(root, f))
    else:
        total = int(data)
    return max(int(cpus or DEFAULT_CPUS),
               math.ceil(total / _TARGET_PARTITION_BYTES))


def get_session(app_name: str = "nyc_taxi_data_engineering_project_spark",
                cpus: str | int | None = None,
                extra_conf: dict | None = None,
                sf_dir: str | None = None) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    Local-mode testing uses ``local[N]``; every setting below is
    cluster-safe (AQE does the runtime right-sizing at scale).
    ``sf_dir`` sizes the initial shuffle-partition count from the input
    bytes (``shuffle_partitions_for``); without it the count defaults
    to the core count (right for the ≤sf0.1 bench/test tier). An
    explicit ``spark.sql.shuffle.partitions`` in ``extra_conf`` wins.
    """
    cpus = str(cpus or DEFAULT_CPUS)
    n_shuffle = (shuffle_partitions_for(sf_dir, cpus)
                 if sf_dir is not None else int(cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
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
    # deployment knob (pinning.py): lets bench/stress harnesses run the
    # whole board under a cluster pin mode without code changes
    if os.environ.get("SPARK_GRAFT_PIN_MODE"):
        builder = builder.config("spark.spark_graft.pin_mode",
                                 os.environ["SPARK_GRAFT_PIN_MODE"])
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
