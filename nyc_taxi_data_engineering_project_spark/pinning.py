"""Multi-consumer pin with a session-switchable durability mode.

Several operators materialize an intermediate frame that multiple plan
branches consume (f2's shingles and bands, f13's bucket tags, f14's
per-round labels, f20's feature vectors, f21's cell assignments) —
without a pin each consumer re-derives the frame from the scan (the
multi-consumer pathology, SCALE.md §5). The *mechanism* of the pin is a
deployment decision, not a query-semantics one, so it is a session
config rather than per-call code:

``spark.spark_graft.pin_mode`` =

- ``localCheckpoint`` (default) — executor-memory/disk blocks owned by
  the returned plan's RDD, released by the ContextCleaner when the
  caller drops the result. Fastest; NOT executor-loss tolerant: on a
  cluster that preempts executors, a lost block fails the job (fail-stop,
  never wrong results). The single-node/bench posture.
- ``disk_persist`` — ``persist(StorageLevel.DISK_ONLY)``. Blocks are
  recomputable from lineage on executor loss (the recovery a real
  cluster needs) but the CacheManager entry outlives the query, so pins
  are TRACKED and the owner releases them: loop-internal pins are
  unpinned as soon as the next round materializes (`unpin`), and the
  caller drops everything that must survive until the result is
  consumed with ``release_pins(spark)`` (the ``io.ingest_trips``
  persist→consume→unpersist pattern at session scope).
- ``checkpoint_table`` — the frame is written to parquet under
  ``spark.spark_graft.pin_dir`` and read back: survives executor loss
  AND driver restart, and with ``bucket_key`` set the table is written
  hash-bucketed + sorted (``io.write_bucketed``) so every downstream
  equi join or aggregation on that key plans with ZERO Exchange on the
  pinned side (the SCALE.md §7 "checkpoint table, join bucketed on
  doc_id" posture for f2's verify join — proved shuffle-free in
  tests/test_bucketing.py). Tables/dirs are tracked and dropped by
  ``unpin`` / ``release_pins``.

All three modes return a DataFrame with identical rows (asserted for
f2 and f14 in tests/test_pinning.py); only durability, lifetime
management, and physical layout differ.

Scoping note: the live-pin registry is process-global, so
``release_pins`` drops EVERY tracked pin — the right semantics for the
one-query-at-a-time batch/bench drivers it serves. Sessions running
cluster-mode queries concurrently should release per-frame
(``unpin``) or serialize release points; the default localCheckpoint
mode tracks nothing and is concurrency-neutral (pinned blocks are
owned by each query's own plan), which is what
tests/test_concurrent_queries.py exercises.
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

MODES = ("localCheckpoint", "disk_persist", "checkpoint_table")

_MODE_CONF = "spark.spark_graft.pin_mode"
_DIR_CONF = "spark.spark_graft.pin_dir"
_BUCKETS_CONF = "spark.spark_graft.pin_buckets"

# (df-id -> (kind, df, path_or_table)) — single-driver registry of live
# pins needing explicit release (modes other than localCheckpoint).
_LIVE: dict[int, tuple[str, DataFrame, str | None]] = {}


def pin_mode(spark) -> str:
    mode = spark.conf.get(_MODE_CONF, "localCheckpoint")
    if mode not in MODES:
        raise ValueError(f"{_MODE_CONF}={mode!r}; expected one of {MODES}")
    return mode


def pin(df: DataFrame, label: str = "pin", eager: bool = True,
        bucket_key: str | None = None) -> DataFrame:
    """Materialize ``df`` once for multiple consumers, per the session's
    pin mode. ``eager=False`` defers materialization to first use where
    the mode supports it (checkpoint_table is inherently eager — the
    write IS the pin). ``bucket_key`` requests a bucketed+sorted layout
    in checkpoint_table mode (ignored elsewhere: in-memory/checkpoint
    blocks keep whatever partitioning ``df`` already carries)."""
    spark = df.sparkSession
    mode = pin_mode(spark)
    if mode == "localCheckpoint":
        return df.localCheckpoint(eager=eager)
    if mode == "disk_persist":
        pinned = df.persist(StorageLevel.DISK_ONLY)
        if eager:
            pinned.count()
        _LIVE[id(pinned)] = ("persist", pinned, None)
        return pinned
    # checkpoint_table
    base = spark.conf.get(_DIR_CONF, "/tmp/spark_graft_pins")
    name = f"{label}_{uuid.uuid4().hex[:12]}"
    path = f"{base}/{name}"
    if bucket_key is not None:
        from . import io as _io  # local import: io imports nothing of ours

        buckets = int(spark.conf.get(_BUCKETS_CONF, "16"))
        tbl = f"spark_graft_pin_{name}"
        _io.write_bucketed(df, tbl, bucket_key, buckets=buckets, path=path)
        out = spark.table(tbl)
        _LIVE[id(out)] = ("table", out, f"{tbl}\t{path}")
        return out
    df.write.mode("overwrite").parquet(path)
    # schema passed explicitly: an empty frame may write zero part files
    out = spark.read.schema(df.schema).parquet(path)
    _LIVE[id(out)] = ("path", out, path)
    return out


def unpin(df: DataFrame) -> None:
    """Release one pin created by :func:`pin` (no-op for untracked
    frames, i.e. everything in localCheckpoint mode). Loop bodies call
    this on round N-1's pin once round N is materialized so disk
    footprint stays one-round-deep."""
    entry = _LIVE.pop(id(df), None)
    if entry is None:
        return
    _release(entry)


def release_pins(spark=None) -> int:
    """Release every live tracked pin; returns how many were released.
    The owning-caller counterpart of ``unpin`` for pins that must
    survive until the query result is consumed (call after collecting)."""
    n = 0
    for entry in list(_LIVE.values()):
        _release(entry)
        n += 1
    _LIVE.clear()
    return n


def _release(entry: tuple[str, DataFrame, str | None]) -> None:
    kind, df, ref = entry
    if kind == "persist":
        df.unpersist(blocking=False)
        return
    if kind == "table":
        tbl, path = ref.split("\t", 1)
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(path, ignore_errors=True)
        return
    shutil.rmtree(ref, ignore_errors=True)
