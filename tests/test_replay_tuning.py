"""r14 optimization: the bounded-replay harness's tuning seams
(streaming.run_available_now) — state-partition default/override and
the ephemeral checkpoint root. The OPTIMIZATION_r14.md streaming section
documents the measurements these encode (d2 8→2 parts halves the
micro-batch wall). r15 replaced d8's core-derived override with a
fixed 8 (its own env knob, SPARK_GRAFT_D8_STATE_PARTS) — the
core-derived value anti-scaled under the driver's cold protocol
(OPTIMIZATION_r15.md); the generic override seam stays (deployment
knob, exercised below)."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from conftest import SF_DIR
from nyc_taxi_data_engineering_project_spark.streaming import (
    _replay_checkpoint_root,
    _replay_state_partitions,
    events_stream,
    run_available_now,
)


def test_replay_state_partitions_default_and_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_REPLAY_STATE_PARTS", raising=False)
    assert _replay_state_partitions() == "2"
    monkeypatch.setenv("SPARK_GRAFT_REPLAY_STATE_PARTS", "7")
    assert _replay_state_partitions() == "7"


def test_replay_checkpoint_root_env_and_tmpfs(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_REPLAY_CKPT_DIR", "/tmp/somewhere")
    assert _replay_checkpoint_root() == "/tmp/somewhere"
    monkeypatch.delenv("SPARK_GRAFT_REPLAY_CKPT_DIR", raising=False)
    root = _replay_checkpoint_root()
    # tmpfs when the host offers it, else Spark's temp default (None)
    assert root == ("/dev/shm" if os.path.isdir("/dev/shm") else None)


def test_run_available_now_restores_session_partitions_and_cleans_ckpt(
    spark,
):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    name = f"rt_{uuid.uuid4().hex[:8]}"
    stream = (
        events_stream(spark, SF_DIR)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = run_available_now(stream, name, output_mode="complete")
    assert got.count() > 0
    # session value restored, not left at the replay bound
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    # ephemeral checkpoint removed (nothing of ours left under the root)
    root = _replay_checkpoint_root()
    if root:
        assert not [
            d for d in os.listdir(root) if d.startswith(f"replay_{name}_")
        ]


def test_run_available_now_state_partitions_override(spark):
    """A per-query override changes the state-partition bound without
    changing the result (deployment seam; d8 passes a fixed 8 through
    it, overridable via SPARK_GRAFT_D8_STATE_PARTS)."""
    name = f"ro_{uuid.uuid4().hex[:8]}"
    stream = (
        events_stream(spark, SF_DIR)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    got = run_available_now(
        stream, name, output_mode="append",
        state_partitions=spark.sparkContext.defaultParallelism,
    )
    batch = (
        events_stream(spark, SF_DIR).sparkSession.read.parquet(
            os.path.join(SF_DIR, "events.parquet")
        )
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    assert got.count() == batch.count()
