"""Shared fixtures: one SparkSession per test run, DuckDB oracle connection,
and the Spark-vs-DuckDB comparator that mirrors the driver's correctness
gate (row-count + column names + order-insensitive value compare)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

# the ONE canonicalizer (row level; cell-level canon lives inside),
# shared with scripts/drive_contract.py so the pytest comparator and
# the contract drive can never disagree about what counts as a match
from canon import canon_rows as _canon_rows  # noqa: E402

from nyc_taxi_data_engineering_project_spark.catalog import TESTDATA_TABLES
from nyc_taxi_data_engineering_project_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session("nyc-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    yield con
    con.close()


def assert_df_matches_oracle(spark_df, con, sql, key=""):
    """Mirror of the driver gate: same row count, same sorted column
    names, same multiset of canonicalized rows."""
    sdf = spark_df.toPandas()
    odf = con.sql(sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{key}: columns differ: spark={sorted(sdf.columns)} "
        f"oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{key}: row count differs: spark={len(sdf)} oracle={len(odf)}"
    )
    cols = sorted(sdf.columns)
    srows = _canon_rows(sdf[cols].itertuples(index=False))
    orows = _canon_rows(odf[cols].itertuples(index=False))
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, (
        f"{key}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
