"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference `PC-User-Guest/NYC-Taxi-Data-Engineering-Project`.

Architecture (SURVEY.md §7): DataFrame/Spark-SQL first, Catalyst-optimized,
Pandas-UDF only for the genuinely non-relational path. The reference's
Postgres star schema + analytical SQL surface is re-expressed as:

- ``session``   — SparkSession factory (AQE, UTC, ANSI off, dyn. overwrite)
- ``schemas``   — StructType contracts (taxi star schema + driver testdata)
- ``conform``   — tolerant source-schema resolution (ingest_data.py:110-149)
- ``io``        — readers + idempotent writers (ingest_data.py:88-183)
- ``catalog``   — table/view registration (sql/init.sql DDL equivalent)
- ``registry``  — query-key registry binding DataFrame impls to SQL oracles
- ``queries``   — the operator inventory of SURVEY.md §2 (groups A-F)
- ``streaming`` — Structured Streaming surface (group D)
"""

__version__ = "0.1.0"
