"""StructType contracts.

Taxi star schema derived from the reference DDL (``sql/init.sql:12-42``)
and the pandas dtype contract (``python/ingest_data.py:18-35``); type
mapping rationale in SURVEY.md §1.2. Money columns are DecimalType(18,2)
at rest (SURVEY.md §7.4 hard-point 1); timestamps are session-TZ-pinned
(UTC) TimestampType for maximum engine compatibility.

``CANDIDATES`` is the multi-candidate source-column resolution table
(``python/ingest_data.py:117-145``): per target column, the ordered list
of acceptable source spellings (case-insensitive), so one conform pass
serves green (lpep), yellow (tpep), or pre-normalized inputs.
"""

from __future__ import annotations

from pyspark.sql import types as T

MONEY = T.DecimalType(18, 2)

TRIPS_SCHEMA = T.StructType([
    T.StructField("vendor_id", T.IntegerType()),
    T.StructField("pickup_datetime", T.TimestampType()),
    T.StructField("dropoff_datetime", T.TimestampType()),
    T.StructField("store_and_fwd_flag", T.StringType()),
    T.StructField("rate_code_id", T.IntegerType()),
    T.StructField("pickup_location_id", T.IntegerType()),
    T.StructField("dropoff_location_id", T.IntegerType()),
    T.StructField("passenger_count", T.IntegerType()),
    T.StructField("trip_distance", T.DoubleType()),
    T.StructField("fare_amount", MONEY),
    T.StructField("extra", MONEY),
    T.StructField("mta_tax", MONEY),
    T.StructField("tip_amount", MONEY),
    T.StructField("tolls_amount", MONEY),
    T.StructField("improvement_surcharge", MONEY),
    T.StructField("total_amount", MONEY),
    T.StructField("payment_type", T.IntegerType()),
    T.StructField("trip_type", T.IntegerType()),
    T.StructField("congestion_surcharge", MONEY),
])

ZONES_SCHEMA = T.StructType([
    T.StructField("location_id", T.IntegerType(), nullable=False),
    T.StructField("borough", T.StringType()),
    T.StructField("zone", T.StringType()),
    T.StructField("service_zone", T.StringType()),
])

# target column -> ordered candidate source names (first match wins;
# matching is case-insensitive; no match -> all-null column of the
# contract type). Mirrors python/ingest_data.py:126-145.
CANDIDATES: dict[str, list[str]] = {
    "vendor_id": ["vendorid", "vendor_id"],
    "pickup_datetime": ["lpep_pickup_datetime", "pickup_datetime",
                        "tpep_pickup_datetime"],
    "dropoff_datetime": ["lpep_dropoff_datetime", "dropoff_datetime",
                         "tpep_dropoff_datetime"],
    "store_and_fwd_flag": ["store_and_fwd_flag", "store_and_fwd"],
    "rate_code_id": ["ratecodeid", "rate_code_id", "ratecode"],
    "pickup_location_id": ["pulocationid", "pu_location_id",
                           "pickup_location_id"],
    "dropoff_location_id": ["dolocationid", "do_location_id",
                            "dropoff_location_id"],
    "passenger_count": ["passengercount", "passenger_count"],
    "trip_distance": ["trip_distance"],
    "fare_amount": ["fare_amount"],
    "extra": ["extra"],
    "mta_tax": ["mta_tax", "mtatax"],
    "tip_amount": ["tip_amount"],
    "tolls_amount": ["tolls_amount"],
    "improvement_surcharge": ["improvement_surcharge"],
    "total_amount": ["total_amount"],
    "payment_type": ["payment_type"],
    "trip_type": ["trip_type"],
    "congestion_surcharge": ["congestion_surcharge"],
}

# zones CSV rename map (python/ingest_data.py:96-101)
ZONES_RENAMES: dict[str, str] = {
    "locationid": "location_id",
    "borough": "borough",
    "zone": "zone",
    "service_zone": "service_zone",
}

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])
