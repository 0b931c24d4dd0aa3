"""Unit tests for the conform layer (SURVEY.md §5.2.3) — the reference's
one nontrivial algorithm (``python/ingest_data.py:110-149``), exercised
with green (lpep), yellow (tpep), and pre-normalized column spellings per
FIXTURES.md §1a."""

from __future__ import annotations

from pyspark.sql import Row

from nyc_taxi_data_engineering_project_spark.conform import (
    conform_trips,
    conform_zones,
)
from nyc_taxi_data_engineering_project_spark.schemas import (
    TRIPS_SCHEMA,
    ZONES_SCHEMA,
)

GREEN_ROWS = [
    Row(VendorID=1, lpep_pickup_datetime="2025-11-03 10:00:00",
        lpep_dropoff_datetime="2025-11-03 10:30:00", store_and_fwd_flag="N",
        RatecodeID=1, PULocationID=74, DOLocationID=75, passenger_count=2,
        trip_distance=3.5, fare_amount=14.5, extra=0.5, mta_tax=0.5,
        tip_amount=2.0, tolls_amount=0.0, improvement_surcharge=0.3,
        total_amount=17.8, payment_type=1, trip_type=1,
        congestion_surcharge=2.75),
    # unparseable pickup → coerced to null → dropped by A9
    Row(VendorID=2, lpep_pickup_datetime="not-a-date",
        lpep_dropoff_datetime="2025-11-03 11:00:00", store_and_fwd_flag="N",
        RatecodeID=1, PULocationID=41, DOLocationID=42, passenger_count=1,
        trip_distance=1.0, fare_amount=5.0, extra=0.0, mta_tax=0.5,
        tip_amount=0.0, tolls_amount=0.0, improvement_surcharge=0.3,
        total_amount=5.8, payment_type=2, trip_type=1,
        congestion_surcharge=0.0),
]


def test_green_spelling_conforms(spark):
    out = conform_trips(spark.createDataFrame(GREEN_ROWS))
    assert [f.name for f in out.schema.fields] == [
        f.name for f in TRIPS_SCHEMA.fields
    ]
    rows = out.collect()
    # bad-date row dropped AFTER coerce (reference order :128 then :148)
    assert len(rows) == 1
    r = rows[0]
    assert r.vendor_id == 1 and r.pickup_location_id == 74
    assert str(r.pickup_datetime).startswith("2025-11-03 10:00")
    assert float(r.total_amount) == 17.80


def test_tpep_spelling_and_missing_column(spark):
    # yellow spelling, trip_type column absent entirely (FIXTURES.md §1a)
    df = spark.createDataFrame(
        [
            Row(VendorID=2, tpep_pickup_datetime="2025-11-05 08:00:00",
                tpep_dropoff_datetime="2025-11-05 08:20:00",
                PULocationID=132, DOLocationID=230, passenger_count=1,
                trip_distance=10.2, fare_amount=35.0, total_amount=42.0,
                payment_type=1)
        ]
    )
    out = conform_trips(df)
    r = out.collect()[0]
    assert r.trip_type is None            # A7: null-injected
    assert r.rate_code_id is None         # absent candidate → null
    assert r.pickup_location_id == 132
    assert str(r.pickup_datetime).startswith("2025-11-05 08:00")


def test_prenormalized_passthrough_and_types(spark):
    df = spark.createDataFrame(
        [Row(pickup_datetime="2025-11-10 12:00:00", vendor_id=1,
             trip_distance=2.0, fare_amount=9.0, pickup_location_id=4)]
    )
    out = conform_trips(df)
    assert dict(out.dtypes)["fare_amount"] == "decimal(18,2)"
    assert dict(out.dtypes)["pickup_datetime"] == "timestamp"
    assert out.count() == 1


def test_keep_null_pickup_when_filter_disabled(spark):
    df = spark.createDataFrame(
        [Row(lpep_pickup_datetime="garbage", fare_amount=1.0)]
    )
    assert conform_trips(df, drop_null_pickup=False).count() == 1
    assert conform_trips(df, drop_null_pickup=True).count() == 0


def test_zones_csv_spelling(spark):
    # CSV spelling variant with string key (FIXTURES.md §2a)
    df = spark.createDataFrame(
        [Row(LocationID="74", Borough="Manhattan",
             Zone="East Harlem North", service_zone="Boro Zone")]
    )
    out = conform_zones(df)
    assert [f.name for f in out.schema.fields] == [
        f.name for f in ZONES_SCHEMA.fields
    ]
    r = out.collect()[0]
    assert r.location_id == 74 and r.borough == "Manhattan"
