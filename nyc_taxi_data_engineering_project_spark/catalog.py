"""Catalog layer — the Spark equivalent of the reference's DDL bootstrap
(``sql/init.sql:9-47``; SURVEY.md §3 entry point 2).

The reference materializes a fixed star schema and three B-tree indexes.
In Spark the same capability is: register the parquet tables in the session
(temp views here; ``saveAsTable`` for a persistent metastore), and replace
indexes with storage layout — date partitioning for range pruning, broadcast
joins for the small dimensions (SURVEY.md §1.4, §4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# (Broadcast decisions are made at each join site with F.broadcast —
# the zones-dim observation of SURVEY.md §1.1 — and asserted by
# tests/test_plans.py; no central dim list exists so the code can't
# drift from the actual physical plans.)


def events_ts_is_nanos(path: str) -> bool:
    """True iff the events parquet stores ``ts`` as TIMESTAMP(NANOS).

    Driver-side footer peek (pyarrow metadata read, no data IO). The type
    of the driver-provided file has CHANGED between rounds (nanos → micros,
    see TESTDATA.md), silently breaking any code that assumed one unit —
    so both the batch and stream readers dispatch on the actual footer
    type instead of assuming."""
    import pyarrow.parquet as pq

    try:
        return getattr(pq.read_schema(path).field("ts").type,
                       "unit", None) == "ns"
    except Exception:
        return False


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (one parquet file per TESTDATA.md).

    ``events.ts`` is parquet timestamp[us] (→ native ``TIMESTAMP_NTZ``;
    session tz is pinned UTC by session.py so NTZ↔epoch conversions are
    deterministic). If a regenerated file is TIMESTAMP(NANOS) — which
    Spark's micro-precision engine cannot represent — it is read as a
    long and floor-divided to micros, the same truncation DuckDB applies
    when casting ns → its micro-precision TIMESTAMP, so oracle
    comparisons agree either way.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and events_ts_is_nanos(path):
        # session-scoped by design, NOT restored: the scan evaluates
        # lazily (possibly long after this call), so the flag must
        # outlive the builder. Only set when the file actually IS nanos;
        # a session also reading OTHER nanos parquet it wants typed as
        # timestamps would need a separate session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """CREATE-OR-REPLACE temp views for SQL-surface queries (C30/C31).

    Mirrors ``CREATE TABLE IF NOT EXISTS`` idempotency
    (``sql/init.sql:12,21``): safe to call repeatedly.
    """
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def bootstrap_database(spark: SparkSession, db: str = "nyc") -> None:
    """``CREATE SCHEMA IF NOT EXISTS nyc`` (``sql/init.sql:9``) equivalent."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
