"""Latent-edge coverage for the conform/io layer: the failure modes the
null-free, collision-free synthetic testdata cannot exhibit (review
findings, round 2)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_taxi_data_engineering_project_spark import io
from nyc_taxi_data_engineering_project_spark.conform import conform_trips


def test_conform_coerces_malformed_values_under_ansi(spark):
    """The coerce-to-null contract must hold on an ANSI session (Spark
    4's default): malformed numerics null out instead of killing the
    job."""
    df = spark.createDataFrame(
        [("2025-11-01 10:00:00", "N/A", "1.5x"),
         ("2025-11-02 11:00:00", "12.5", "2")],
        "lpep_pickup_datetime string, fare_amount string, "
        "passenger_count string",
    )
    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        rows = {r.pickup_datetime.day: (r.fare_amount, r.passenger_count)
                for r in conform_trips(df).collect()}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert rows[1] == (None, None)          # coerced, not crashed
    assert rows[2][0] is not None and float(rows[2][0]) == 12.5


def test_conform_case_duplicate_columns_last_wins(spark):
    """Case-duplicate source columns (VendorID + vendorid) must not blow
    up with AMBIGUOUS_REFERENCE; the LAST occurrence wins (the
    reference's dict-index tie-break)."""
    df = (
        spark.createDataFrame(
            [(7, 9, "2025-11-01 10:00:00")],
            ["VendorID", "vendorid_2", "lpep_pickup_datetime"],
        )
        .withColumnRenamed("vendorid_2", "vendorid")
    )
    out = conform_trips(df, drop_null_pickup=False).collect()
    assert out[0].vendor_id == 9  # the later column won


def test_ingest_empty_batch_returns_zero(spark, tmp_path):
    """A fully-filtered first batch (all pickups null) must return 0,
    not crash on schema inference over a data-file-less target."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(None,), (None,)], "lpep_pickup_datetime string"
    ).write.parquet(src)
    n = io.ingest_trips(spark, src, str(tmp_path / "tgt"))
    assert n == 0


def test_surrogate_ids_ordered_is_partition_parallel(spark):
    """The ordered surrogate path must be the two-phase rank: dense,
    correct, and with its corpus-sized window PARTITIONED (no
    single-task global window), returning longs."""
    df = spark.range(10_000).select(
        (F.col("id") * 37 % 10_000).alias("k")
    )
    out = io.surrogate_ids(df, order_cols=["k"], partitions=8)
    assert dict(out.dtypes)["trip_id"] == "bigint"
    ids = sorted(r.trip_id for r in out.collect())
    assert ids == list(range(1, 10_001))    # dense 1..N, no dupes
    plan_lines = [
        ln
        for ln in out._jdf.queryExecution().executedPlan()
        .toString().splitlines()
        if "row_number" in ln
    ]
    assert plan_lines and all("_pid" in ln for ln in plan_lines), (
        "row_number window lost its partition key"
    )


def test_write_table_overwrite_truncates_stale_partitions(spark, tmp_path):
    """write_table(mode='overwrite', partition_by=...) is the full-
    refresh path: partitions absent from the new frame must NOT survive
    (the session-wide dynamic default must be overridden per-write)."""
    path = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, p string")
    io.write_table(v1, path, partition_by=["p"])
    v2 = spark.createDataFrame([(3, "a")], "id long, p string")
    io.write_table(v2, path, partition_by=["p"])
    got = [(r.id, r.p) for r in spark.read.parquet(path).collect()]
    assert got == [(3, "a")]                # partition 'b' is gone


def test_with_month_rejects_non_utc_session(spark):
    df = spark.createDataFrame(
        [("2025-11-01 10:00:00",)], "pickup_datetime string"
    ).select(F.col("pickup_datetime").cast("timestamp"))
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="UTC"):
            io.with_month(df)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
