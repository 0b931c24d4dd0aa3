"""fx hashed result digest (r8, verdict ask 6): the in-engine compare
that value-verified q18's 15 M rows at K=1000, now engine surface.
Validated here on the five shape classes the stress harness proved —
mixed 2-dp/4-dp floats (q1), string+count (q21), float+date (q3),
date+revenue (flagship), heavy multi-column (q18) — by asserting the
digest agrees with BOTH the DuckDB twin digest and the canon driver
compare on the same results; plus sensitivity and order-insensitivity
controls the positive path can't prove.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

from conftest import SF_DIR
from nyc_taxi_data_engineering_project_spark import fx, registry

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
from canon import canon_rows  # noqa: E402

# q16 carries the string+count shape q21 proved at K=100 (q21 is
# legitimately EMPTY at this SF — covered by the empty-agreement test)
SHAPE_KEYS = [
    "tpch_q1", "tpch_q16", "tpch_q3", "flagship_daily_region_revenue",
    "tpch_q18",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    return con


@pytest.mark.parametrize("key", SHAPE_KEYS)
def test_digest_agrees_with_duck_twin_and_driver_compare(spark, duck, key):
    registry.load_all()
    sdf = registry.QUERIES[key](spark, SF_DIR)
    quanta = fx.column_quanta(registry.ORACLES[key])

    n_s, h_s = fx.hashed_result_digest(sdf, quanta)
    orow = duck.sql(fx.sql_hashed_digest(
        registry.ORACLES[key], fx.hashed_row_sql(sdf.schema, quanta)
    )).fetchone()
    n_o = int(orow[0])
    h_o = None if orow[1] is None else int(orow[1])
    assert (n_s, h_s) == (n_o, h_o), f"{key}: digest mismatch"
    assert n_s > 0 and h_s is not None

    # the digest's verdict must coincide with the driver-compare path
    # (canon_rows over collected results) on the same data
    spdf = sdf.toPandas()
    odf = duck.sql(registry.ORACLES[key]).df()
    cols = sorted(spdf.columns)
    assert canon_rows(spdf[cols].itertuples(index=False)) == \
        canon_rows(odf[cols].itertuples(index=False)), (
        f"{key}: digest said equal but the driver compare disagrees")


def test_empty_key_digests_agree(spark, duck):
    """q21 selects nothing at this SF — both engines must agree on
    (0, None), the empty digest, rather than erroring or fabricating."""
    registry.load_all()
    sdf = registry.QUERIES["tpch_q21"](spark, SF_DIR)
    quanta = fx.column_quanta(registry.ORACLES["tpch_q21"])
    got = fx.hashed_result_digest(sdf, quanta)
    orow = duck.sql(fx.sql_hashed_digest(
        registry.ORACLES["tpch_q21"],
        fx.hashed_row_sql(sdf.schema, quanta))).fetchone()
    assert got == (0, None) == (int(orow[0]), orow[1])


def test_digest_detects_one_changed_value(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.25), (2, "b", 2.50), (3, None, 3.75)],
        "id long, tag string, amt double",
    )
    quanta = {"amt": 0.01}
    base = fx.hashed_result_digest(df, quanta)
    # one quantum step in one float of one row must change the digest
    bumped = spark.createDataFrame(
        [(1, "a", 1.25), (2, "b", 2.51), (3, None, 3.75)],
        "id long, tag string, amt double",
    )
    assert fx.hashed_result_digest(bumped, quanta) != base
    # sub-quantum drift (the cross-engine float seam the quantum
    # absorbs) must NOT change it
    drifted = spark.createDataFrame(
        [(1, "a", 1.25 + 1e-9), (2, "b", 2.50), (3, None, 3.75)],
        "id long, tag string, amt double",
    )
    assert fx.hashed_result_digest(drifted, quanta) == base
    # a NULL is not the same row as any value
    nulled = spark.createDataFrame(
        [(1, "a", 1.25), (2, "b", None), (3, None, 3.75)],
        "id long, tag string, amt double",
    )
    assert fx.hashed_result_digest(nulled, quanta) != base


def test_digest_is_order_insensitive_and_multiset_exact(spark):
    rows = [(i, f"t{i % 3}", i * 0.25) for i in range(100)]
    schema = "id long, tag string, amt double"
    fwd = fx.hashed_result_digest(spark.createDataFrame(rows, schema))
    rev = fx.hashed_result_digest(
        spark.createDataFrame(list(reversed(rows)), schema))
    assert fwd == rev
    # a duplicated row changes the SUM (multiset, not set, semantics)
    dup = fx.hashed_result_digest(
        spark.createDataFrame(rows + [rows[0]], schema))
    assert dup != fwd and dup[0] == fwd[0] + 1


def test_empty_result_digest_is_zero_count_null_hash(spark):
    df = spark.createDataFrame([], "id long, amt double")
    assert fx.hashed_result_digest(df) == (0, None)
