"""salted_join (skew.py): semantic equivalence to the plain equi join for
every supported join type — the salt must change only the partitioning,
never the result — plus the guard on replication-unsafe types.
"""

from __future__ import annotations

import os

import pytest

from conftest import SF_DIR
from nyc_taxi_data_engineering_project_spark.skew import salted_join


def _counts(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def frames(spark):
    li = (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .select("l_orderkey", "l_quantity")
        .limit(2000)
    )
    # drop some orders so left/anti have unmatched fact rows
    orders = (
        spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        .select("o_orderkey", "o_orderpriority")
        .filter("o_orderkey % 3 != 0")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    return li, orders


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_salted_join_matches_plain_join(spark, frames, how):
    li, orders = frames
    plain = li.join(orders, on=["l_orderkey"], how=how)
    salted = salted_join(li, orders, on=["l_orderkey"], n_salt=7, how=how)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _counts(salted) == _counts(plain)


def test_salted_join_rejects_dim_preserving_types(frames):
    li, orders = frames
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(li, orders, on=["l_orderkey"], how=how)
