"""Decimal-at-rest semantics (SURVEY.md §7.4 hard-point 1).

The reference declares money as ``NUMERIC`` in Postgres
(``sql/init.sql:26-35``) while its pandas layer carries float64 — the
engine's contract (schemas.py) makes DecimalType(18,2) the at-rest type.
These tests exercise the full conform → write → read → aggregate path on
the taxi schema and pin the three behaviors double money silently gets
wrong: exact at-rest scale, drift-free summation, and Spark's documented
precision-widening rules for decimal aggregates.
"""

import decimal

import pytest

from pyspark.sql import Row, types as T

from nyc_taxi_data_engineering_project_spark.conform import conform_trips
from nyc_taxi_data_engineering_project_spark.io import read_table, write_table

D = decimal.Decimal


@pytest.fixture(scope="module")
def conformed_path(spark, tmp_path_factory):
    """A green-cab-spelled frame with adversarial money values, conformed
    and written to parquet — the at-rest tier every aggregate reads."""
    rows = [
        Row(
            VendorID=1,
            lpep_pickup_datetime=f"2024-01-01 10:{i:02d}:00",
            lpep_dropoff_datetime=f"2024-01-01 10:{i+1:02d}:00",
            PULocationID=i % 5,
            DOLocationID=(i + 1) % 5,
            # 0.10 is inexact in binary floating point: 10k additions
            # drift (sum(0.1 × 10k) = 999.9999999999062 in float64)
            fare_amount=0.10,
            # 2.675 is the classic rounding trap: binary 2.675 is
            # 2.67499999…, yet Spark's double→decimal cast goes through
            # the double's SHORTEST decimal repr ("2.675") and HALF_UP →
            # 2.68 — unlike C/numpy round() on the raw binary (2.67)
            tip_amount=2.675,
            total_amount=0.10 + 2.675,
        )
        for i in range(10_000)
    ]
    df = spark.createDataFrame(rows)
    out = str(tmp_path_factory.mktemp("decimal") / "trips")
    write_table(conform_trips(df, drop_null_pickup=False), out)
    return out


def test_decimal_survives_parquet_roundtrip(spark, conformed_path):
    back = read_table(spark, conformed_path)
    money_cols = ["fare_amount", "tip_amount", "total_amount"]
    for c in money_cols:
        assert back.schema[c].dataType == T.DecimalType(18, 2), c


def test_decimal_sum_is_exact_not_drifted(spark, conformed_path):
    """10 000 × 0.10 must be exactly 1000.00 — the float64 path the
    reference's pandas layer takes yields 999.9999999999062."""
    back = read_table(spark, conformed_path)
    row = back.selectExpr("sum(fare_amount) AS s").first()
    assert row.s == D("1000.00")


def test_decimal_cast_rounds_shortest_repr_half_up(spark, conformed_path):
    """Pin the cast rule: Spark converts a double through its shortest
    decimal representation then rounds HALF_UP — so 2.675 (binary
    2.674999…) lands at 2.68 on every row, deterministically. Engines
    that round the raw binary value (C round(), numpy) give 2.67; a
    migration between the two silently moves money."""
    back = read_table(spark, conformed_path)
    distinct = [r.tip_amount for r in
                back.select("tip_amount").distinct().collect()]
    assert distinct == [D("2.68")]


def test_decimal_aggregate_widening(spark, conformed_path):
    """Spark's decimal aggregate typing: SUM(decimal(18,2)) widens
    precision by 10 → decimal(28,2) (no overflow at 100 TB row counts);
    AVG yields scale 6 (decimal(22,6)). Both stay decimal — an engine
    that silently falls back to double here re-introduces drift."""
    back = read_table(spark, conformed_path)
    agg = back.selectExpr(
        "sum(fare_amount) AS s", "avg(fare_amount) AS a"
    )
    assert agg.schema["s"].dataType == T.DecimalType(28, 2)
    assert agg.schema["a"].dataType == T.DecimalType(22, 6)
    got = agg.first()
    assert got.a == D("0.100000")


def test_decimal_arithmetic_stays_exact(spark, conformed_path):
    """fare + tip must equal the conformed total on every row — in
    decimal this is an exact equality, no epsilon."""
    back = read_table(spark, conformed_path)
    mismatched = back.filter(
        "fare_amount + tip_amount <> total_amount"
    ).count()
    assert mismatched == 0


# --------------------------------------------------------------- r7 class
# The r7 class-wide posture (fx.py module docstring; SCALE.md §13d): every
# money aggregate whose per-group row count grows with the data accumulates
# in decimal on BOTH engines. Nothing else pins this — the plan-signature
# contract tracks plan shapes, not expression types, and the driver compare
# passes on small SFs even for double sums (the drift class only manifests
# at ~1e8+ rows, K=1000 territory). These asserts are the regression gate:
# a silent revert of any converted key back to a double sum fails here,
# not three rounds later in a stress probe.

DECIMAL_CLASS_KEYS = [
    "flagship_daily_region_revenue", "b2_join_pickup_zone",
    "b8_groupby_day", "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8",
    "tpch_q11", "tpch_q14", "tpch_q17", "tpch_q19", "tpch_q22",
    # r8: the two class members the r7 sweep missed (ADVICE finding) —
    # c33's 5 fixed-priority sums over the whole join (~1e13/group at
    # K=1000) and c7's 3 fixed price bands over part (~1e11/group)
    "c33_salted_join", "c7_range_join",
]


def _sum_arguments(plan: str) -> list[str]:
    """Every sum(...) argument in a plan string, balanced-paren extracted.

    The r7 regex (``sum\\(.{0,200}?decimal\\(18,..``, re.S) could cross
    the sum's closing paren and latch onto an unrelated decimal cast
    elsewhere in the plan (r8 ADVICE finding) — a key silently reverted
    to a double sum could still pass. Extracting the argument with a
    paren counter makes the assertion airtight: the decimal cast must be
    INSIDE the sum."""
    low = plan.lower()
    args, i = [], 0
    while (j := low.find("sum(", i)) >= 0:
        if j > 0 and (low[j - 1].isalnum() or low[j - 1] == "_"):
            i = j + 4  # isum(/foosum( — not the aggregate
            continue
        depth, k = 1, j + 4
        while k < len(plan) and depth:
            depth += {"(": 1, ")": -1}.get(plan[k], 0)
            k += 1
        args.append(plan[j + 4:k - 1])
        i = k
    return args


@pytest.mark.parametrize("key", DECIMAL_CLASS_KEYS)
def test_money_class_key_sums_in_decimal_both_engines(spark, key):
    import re

    from nyc_taxi_data_engineering_project_spark import registry

    registry.load_all()
    from tests.conftest import SF_DIR

    df = registry.QUERIES[key](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()

    def is_decimal_sum(arg: str) -> bool:
        # inline cast inside the sum (q5/q6-style) ...
        if re.search(r"(?is)\bcast\(.* as decimal\(18,\s*[24]\)", arg):
            return True
        # ... or the argument references a column a lower Project defines
        # as a decimal(18,2|4) cast (q8-style: `cast(... as decimal(18,4))
        # AS volume#53` below, `sum(volume#53)` above)
        return any(
            re.search(rf"(?is)as decimal\(18,\s*[24]\)\) AS \w+#{ref}\b",
                      plan)
            for ref in set(re.findall(r"#(\d+)", arg))
        )

    money_sums = [a for a in _sum_arguments(plan) if is_decimal_sum(a)]
    assert money_sums, (
        f"{key}: no sum whose argument is decimal(18,2|4)-cast in the "
        "optimized plan — the r7 money-class posture (fx.dec) has been "
        "reverted on the Spark side")
    # and the oracle must accumulate the same way (fx.sql_dec spelling)
    assert "DECIMAL(18," in registry.ORACLES[key].upper(), (
        f"{key}: oracle SQL lost its DECIMAL(18,s) accumulation — the "
        "two engines would sum in different arithmetic")


def test_q11_threshold_cast_has_overflow_headroom(spark):
    """Q11's HAVING threshold rides CAST(SUM(value) AS DECIMAL(28,4)).
    DuckDB raises on a cast overflow; Spark under ansi=false returns
    NULL — which would make the comparison NULL and the result SILENTLY
    EMPTY on exactly one engine (r8 ADVICE). This pins the invariant the
    comment in tpch.py relies on: the actual global money sum carries
    ≥ 10^6 headroom under the 10^24 cap even extrapolated to 100 TB
    (~10^7× the sf0.1 corpus), so the NULL branch is unreachable. If
    data regeneration ever inflates money magnitudes enough to fail
    this, the cast must widen BEFORE the silent-empty mode can occur."""
    from nyc_taxi_data_engineering_project_spark import fx
    from nyc_taxi_data_engineering_project_spark.catalog import (
        register_views)
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR, ("lineitem", "supplier", "nation"))
    rev = "l_extendedprice * (1 - l_discount)"
    got = spark.sql(
        f"SELECT CAST(SUM({fx.sql_dec(rev)}) AS DECIMAL(28,4)) AS t, "
        f"SUM({fx.sql_dec(rev)}) AS raw FROM lineitem"
    ).collect()[0]
    assert got["t"] is not None, (
        "q11 threshold cast overflowed to NULL — Spark would return a "
        "silently empty q11 result; widen the DECIMAL(28,4) cast")
    # headroom: the UNFILTERED global revenue sum (an upper bound on
    # q11's one-nation pv total) must sit ≥ 10^7 under the cap, so even
    # a 100 TB corpus (~10^7× sf0.001 rows ≈ ×10^7 the sum) cannot reach
    # the NULL branch without this test failing first at small SF.
    assert abs(got["raw"]) < decimal.Decimal(10) ** 17, (
        f"global money sum {got['raw']} has < 10^7 headroom under the "
        "DECIMAL(28,4) cap at this SF — re-examine the q11 cast width")
