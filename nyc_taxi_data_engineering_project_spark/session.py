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


def _input_bytes(data: str | int) -> int:
    """Total data bytes: a directory of parquet tables (sizes walked
    on the driver — metadata only) or an explicit byte count."""
    if not isinstance(data, str):
        return int(data)
    total = 0
    for root, _dirs, files in os.walk(data):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def shuffle_partitions_for(data: str | int,
                           cpus: str | int | None = None) -> int:
    """Input-size-derived initial shuffle partition count.

    Floor = the core count (below it, idle cores); ceiling = none
    (AQE coalesces)."""
    return max(int(cpus or DEFAULT_CPUS),
               math.ceil(_input_bytes(data) / _TARGET_PARTITION_BYTES))


# AQE skew-gate sizing (r10, verdict ask 1 — the SCALE.md §17 measured
# rule as engine code): AQE splits a skewed join partition only when it
# exceeds BOTH 5× the median AND skewedPartitionThresholdInBytes. The
# 256 MB default threshold assumes 64 MB-advisory healthy partitions;
# an engine that sizes partitions toward ~32 MB of input leaves even a
# pathological hot partition under 256 MB, so the split SILENTLY never
# fires and the stage runs at straggler speed (measured at 60 M rows /
# 50% hot: 10.9 s with default-gated "AQE on" vs 2.9 s once the byte
# thresholds were scaled — 2× faster than explicit 16-way salting,
# scripts/stress100_results/aqe_vs_salting_60m.json). Rule: advisory =
# half the expected per-partition bytes (the split's target chunk,
# shuffle data being roughly parquet-compressed), threshold = 2×
# advisory — the 5×-median guard still protects healthy variation from
# gratuitous splitting. Floors/caps keep the tiny-SF test tier inside
# sane AQE coalescing behavior.
_ADVISORY_MIN_BYTES = 8 << 20
_ADVISORY_MAX_BYTES = 64 << 20


def aqe_skew_conf_for(data: str | int,
                      cpus: str | int | None = None) -> dict[str, str]:
    """Input-size-derived AQE skew/advisory byte thresholds — the
    companion of :func:`shuffle_partitions_for`, derived from the same
    walk so the skew gate scales with the partition sizing instead of
    sitting at a 256 MB default the partitions never reach."""
    expected = max(1, _input_bytes(data)
                   // shuffle_partitions_for(data, cpus))
    advisory = max(_ADVISORY_MIN_BYTES,
                   min(_ADVISORY_MAX_BYTES, expected // 2))
    return {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes":
            str(advisory),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            str(advisory * 2),
    }


def get_session(app_name: str = "nyc_taxi_data_engineering_project_spark",
                cpus: str | int | None = None,
                extra_conf: dict | None = None,
                sf_dir: str | None = None) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    Local-mode testing uses ``local[N]``; every setting below is
    cluster-safe (AQE does the runtime right-sizing at scale).
    ``sf_dir`` sizes the initial shuffle-partition count from the input
    bytes (``shuffle_partitions_for``) AND the AQE skew/advisory byte
    gates from the same walk (``aqe_skew_conf_for`` — the measured
    §17 rule: the 256 MB default silently never fires on ~32 MB-sized
    partitions); without it the count defaults to the core count and
    the Spark-default gates stand (right for the ≤sf0.1 bench/test
    tier). ``extra_conf`` is applied last, so an explicit
    ``spark.sql.shuffle.partitions`` or skew gate wins.
    """
    cpus = str(cpus or DEFAULT_CPUS)
    n_shuffle = (shuffle_partitions_for(sf_dir, cpus)
                 if sf_dir is not None else int(cpus))
    # the skew gate scales with the same walk (r10): without sf_dir the
    # Spark defaults stand (the ≤sf0.1 tier has nothing to split)
    skew_conf = (aqe_skew_conf_for(sf_dir, cpus)
                 if sf_dir is not None else {})
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
        # let HotSpot JIT the wide fused methods whole-stage codegen
        # emits for join-consume stages (SCALE.md §19b): the unrolled
        # 64-dim dot fuses into a ~17 KB-bytecode method, past
        # HotSpot's DontCompileHugeMethods threshold (8000), so the
        # stage ran bytecode-INTERPRETED on every execution (the whole
        # r9→r10 vector-family regression). Measured alternatives:
        # spark.sql.codegen.hugeMethodLimit=8000 fixes these stages 3×
        # via per-expression fallback but un-fuses every 8–64 KB stage
        # board-wide (+16 s at sf0.1, rejected); this JVM flag keeps
        # fusion everywhere and compiles the big methods too (1.42 s →
        # 0.45 s on the pair-dot stage). Cluster deployments need it on
        # executors as well — set on both here.
        .config("spark.driver.extraJavaOptions",
                "-XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions",
                "-XX:-DontCompileHugeMethods")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # deployment knob (pinning.py): lets bench/stress harnesses run the
    # whole board under a cluster pin mode without code changes
    if os.environ.get("SPARK_GRAFT_PIN_MODE"):
        builder = builder.config("spark.spark_graft.pin_mode",
                                 os.environ["SPARK_GRAFT_PIN_MODE"])
    for k, v in skew_conf.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
