"""Oracle-differential test (SURVEY.md §5.2.1) — the local mirror of the
driver's correctness gate: every registered query key with an oracle runs
on Spark and DuckDB over the same parquet and must agree on row count,
column names, and the order-insensitive multiset of values."""

from __future__ import annotations

import pytest

from nyc_taxi_data_engineering_project_spark import registry

registry.load_all()

from conftest import SF_DIR, assert_df_matches_oracle  # noqa: E402

ORACLE_KEYS = sorted(registry.ORACLES)
ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_query_matches_oracle(spark, oracle_con, key):
    df = registry.QUERIES[key](spark, SF_DIR)
    assert_df_matches_oracle(df, oracle_con, registry.ORACLES[key], key=key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_query_runs(spark, key):
    df = registry.QUERIES[key](spark, SF_DIR)
    assert df.count() > 0, f"{key}: rows-only query produced no rows"
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # every queries() key with an oracle_sql() entry must exist
    assert set(e.oracle_sql()) <= set(e.queries())
