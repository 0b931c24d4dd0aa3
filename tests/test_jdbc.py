"""A12 JDBC sink round-trip — real writes into an embedded Apache Derby
database (bundled with the Spark distribution, so no external server or
pip install is involved). The reference's actual sink is Postgres via
``to_sql(if_exists="append", chunksize=...)`` (python/ingest_data.py:
177-181); Derby exercises the identical Spark JDBC write path — batched
inserts per executor partition, append semantics — with only the
url/driver pair differing from a production RDBMS.
"""

import pytest

from pyspark.sql import Row

from nyc_taxi_data_engineering_project_spark.io import write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("no Derby JDBC driver on the Spark classpath")
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _props():
    return {"driver": DERBY_DRIVER}


def test_jdbc_roundtrip_values(spark, derby_url):
    rows = [Row(id=i, name=f"n{i}", amount=float(i) * 1.5) for i in range(100)]
    df = spark.createDataFrame(rows).repartition(4)  # multi-partition write
    write_jdbc(df, derby_url, "trips", mode="overwrite",
               batch_size=16, **_props())
    back = spark.read.jdbc(derby_url, "trips", properties=_props())
    assert sorted(back.columns) == ["amount", "id", "name"]
    assert sorted((r.id, r.name, r.amount) for r in back.collect()) == [
        (r.id, r.name, r.amount) for r in rows
    ]


def test_jdbc_append_is_chunked_append(spark, derby_url):
    """mode=append twice ≡ the reference's if_exists='append' loop —
    rows accumulate, no truncate."""
    df = spark.createDataFrame([Row(id=i, v=i * 2) for i in range(10)])
    write_jdbc(df, derby_url, "appends", mode="overwrite", **_props())
    write_jdbc(df, derby_url, "appends", mode="append", **_props())
    back = spark.read.jdbc(derby_url, "appends", properties=_props())
    assert back.count() == 20
    assert back.groupBy("id").count().filter("count != 2").count() == 0


def test_jdbc_predicate_pushdown_partitioned_read(spark, derby_url):
    """The read side of the surface: a partitioned JDBC scan (numPartitions
    on a numeric column) with a filter pushed into the remote query."""
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(1000)])
    write_jdbc(df, derby_url, "parts", mode="overwrite", **_props())
    back = spark.read.jdbc(
        derby_url, "parts", column="id", lowerBound=0, upperBound=1000,
        numPartitions=4, properties=_props(),
    ).filter("id >= 990")
    assert back.count() == 10
    assert back.rdd.getNumPartitions() == 4
