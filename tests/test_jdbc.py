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


# ------------------------------------------------------- A17 readiness retry

def test_wait_for_jdbc_ready_immediately(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("no Derby JDBC driver on the Spark classpath")
    from nyc_taxi_data_engineering_project_spark.io import wait_for_jdbc

    url = f"jdbc:derby:{tmp_path}/rdy;create=true"
    assert wait_for_jdbc(spark, url, attempts=3, sleep_s=0.1,
                         probe_sql="VALUES 1", **_props()) == 1


def test_wait_for_jdbc_becomes_ready_mid_retry(spark, tmp_path):
    """The reference's actual scenario (python/ingest_data.py:210-221):
    the database starts DOWN and comes up while the loop is waiting —
    the retry must succeed on a LATER attempt, not just attempt 1."""
    if not _derby_available(spark):
        pytest.skip("no Derby JDBC driver on the Spark classpath")
    import threading
    import time as _time

    from nyc_taxi_data_engineering_project_spark.io import wait_for_jdbc

    db = f"{tmp_path}/latedb"
    plain = f"jdbc:derby:{db}"           # no ;create → fails until created

    def create_later():
        _time.sleep(1.2)
        jvm = spark._jvm
        jvm.java.lang.Class.forName(DERBY_DRIVER)
        conn = jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:{db};create=true")
        conn.close()

    t = threading.Thread(target=create_later)
    t.start()
    try:
        attempt = wait_for_jdbc(spark, plain, attempts=20, sleep_s=0.4,
                                probe_sql="VALUES 1", **_props())
    finally:
        t.join()
    assert attempt >= 2, "endpoint was down at first — attempt 1 cannot win"


def test_wait_for_jdbc_exhausts_and_raises(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("no Derby JDBC driver on the Spark classpath")
    import time as _time

    from nyc_taxi_data_engineering_project_spark.io import wait_for_jdbc

    t0 = _time.time()
    with pytest.raises(ConnectionError, match="after 3 attempts"):
        wait_for_jdbc(spark, f"jdbc:derby:{tmp_path}/nonexistent",
                      attempts=3, sleep_s=0.3, probe_sql="VALUES 1",
                      **_props())
    # two sleeps between three attempts; no sleep after the last
    assert _time.time() - t0 >= 0.6


def test_wait_for_jdbc_fails_fast_on_missing_driver(spark):
    """A driver-resolution failure is a CONFIGURATION error, identical
    on every attempt — it must surface immediately instead of burning
    attempts × sleep_s (r8 ADVICE: 90 s to report a typo)."""
    import time as _time

    from nyc_taxi_data_engineering_project_spark.io import wait_for_jdbc

    t0 = _time.time()
    with pytest.raises(ConnectionError, match="driver resolution"):
        # a scheme no registered JDBC driver claims → 'No suitable
        # driver' from DriverManager on attempt 1
        wait_for_jdbc(spark, "jdbc:nosuchscheme://nowhere/db",
                      attempts=30, sleep_s=3.0)
    assert _time.time() - t0 < 5.0, (
        "driver-resolution failure was retried instead of failing fast")
