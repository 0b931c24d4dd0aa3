"""Group A query keys — ETL-surface operators (SURVEY.md §2 group A).

The ingestion operators themselves (conform, idempotent writers) live in
``conform.py``/``io.py`` and are unit-tested; the two A-group keys the
driver checks are the filter and validation-count shapes that survive into
query-land (A9, A16).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "a9_notnull_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id IS NOT NULL AND value IS NOT NULL
    """,
)
def a9_notnull_filter(spark, sf_dir):
    """Not-null row filter (reference: drop null-pickup rows,
    ``python/ingest_data.py:147-148``). IsNotNull pushes down to the
    parquet scan (null-count stats skip whole row groups)."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select("event_id", "user_id", "event_type", "value")
    )


@query(
    "a16_validation_count",
    oracle="""
    SELECT tbl, n FROM (
        SELECT 'lineitem' AS tbl, COUNT(*) AS n FROM lineitem
        UNION ALL SELECT 'orders', COUNT(*) FROM orders
        UNION ALL SELECT 'customer', COUNT(*) FROM customer
        UNION ALL SELECT 'events', COUNT(*) FROM events
        UNION ALL SELECT 'documents', COUNT(*) FROM documents
    )
    """,
)
def a16_validation_count(spark, sf_dir):
    """Post-load validation counts (reference: ``README.md:108``; row-count
    logging ``python/ingest_data.py:183``). Parquet count() is served from
    footer metadata — no data scan."""
    parts = []
    for name in ("lineitem", "orders", "customer", "events", "documents"):
        parts.append(
            table(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(name).alias("tbl"), "n")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "a21_python_datasource",
    oracle="""
    SELECT i AS id,
           md5('42:' || CAST(i AS VARCHAR)) AS fp,
           CAST(('0x' || substr(md5('42:' || CAST(i AS VARCHAR)), 1, 2))
                AS INTEGER) AS bucket
    FROM range(2000) t(i)
    """,
)
def a21_python_datasource(spark, sf_dir):
    """A21: custom Python DataSource (Spark 4 ``pyspark.sql.datasource``)
    — ``pysource.RangeDocsSource`` registered as format 'rangedocs',
    planned into 8 InputPartitions read executor-side in parallel. The
    deterministic seeded-md5 payload is what makes a *custom source*
    oracle-checkable at all: DuckDB rebuilds the identical rows from
    range()+md5. See pysource.py for the production shape this demos."""
    from ..pysource import register

    register(spark)
    return (
        spark.read.format("rangedocs")
        .option("n", 2000).option("partitions", 8)
        .load()
    )
