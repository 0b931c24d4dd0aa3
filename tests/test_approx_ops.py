"""Behavioral gates for the C-group rows-only keys whose values are
engine-internal (sketches, samplers) — the properties a cross-engine
oracle can't check but a user still depends on: approximate answers
land within the sketch's tolerance of the exact ones, and seeded
sampling is deterministic, a true subset, and near its fraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from nyc_taxi_data_engineering_project_spark import registry
from nyc_taxi_data_engineering_project_spark.catalog import table

registry.load_all()


def test_approx_percentile_within_tolerance(spark):
    """c11_approx_percentile (accuracy=10000) must track the exact
    quartiles of l_extendedprice closely — at test scale the rank-error
    bound (n/accuracy) is sub-row, so 2% relative is generous."""
    approx = {
        r.returnflag: (r.p25_price, r.p50_price, r.p75_price)
        for r in registry.QUERIES["c11_approx_percentile"](
            spark, SF_DIR
        ).collect()
    }
    exact = {
        r.returnflag: (r.p25, r.p50, r.p75)
        for r in (
            table(spark, SF_DIR, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.expr("percentile(l_extendedprice, 0.25D)").alias("p25"),
                F.expr("percentile(l_extendedprice, 0.5D)").alias("p50"),
                F.expr("percentile(l_extendedprice, 0.75D)").alias("p75"),
            )
            .withColumnRenamed("l_returnflag", "returnflag")
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for flag, qs in approx.items():
        for got, want in zip(qs, exact[flag]):
            assert abs(got - want) <= 0.02 * abs(want), (flag, got, want)


def test_sample_deterministic_subset_and_fraction(spark):
    """c29_sample: same seed → identical rows across runs; every sampled
    row exists in the source; observed fraction near the requested 0.1
    (Bernoulli at test n: ±5 absolute percentage points is ~5 sigma)."""
    key = lambda r: (r.l_orderkey, r.l_linenumber)  # noqa: E731
    a = registry.QUERIES["c29_sample"](spark, SF_DIR).collect()
    b = registry.QUERIES["c29_sample"](spark, SF_DIR).collect()
    assert sorted(map(key, a)) == sorted(map(key, b)), "seed not stable"
    src = {
        key(r)
        for r in table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    assert {key(r) for r in a} <= src, "sampled row not in source"
    frac = len(a) / len(src)
    assert 0.05 <= frac <= 0.15, f"fraction {frac:.3f} far from 0.1"


def test_portable_hll_within_tolerance(spark):
    """c38_portable_hll (r9): the from-scratch 256-bucket HLL's
    per-month estimate must land within the sketch's accuracy band of
    the exact distinct count. Standard error for m=256 is
    1.04/sqrt(256) = 6.5%; gate at 4 sigma (26%) so the test pins
    gross construction errors (wrong rank, wrong bucket, wrong
    harmonic sum) without flaking on corpus shape."""
    approx = {
        r.month: r.approx_users
        for r in registry.QUERIES["c38_portable_hll"](
            spark, SF_DIR).collect()
    }
    exact = {
        r.month: r.n
        for r in (
            table(spark, SF_DIR, "events")
            .filter("ts IS NOT NULL AND user_id IS NOT NULL")
            .groupBy(F.substring(F.col("ts").cast("string"), 1, 7)
                     .alias("month"))
            .agg(F.count_distinct("user_id").alias("n"))
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for month, n in exact.items():
        err = abs(approx[month] - n) / max(n, 1)
        assert err <= 0.26, (
            f"{month}: HLL estimate {approx[month]} vs exact {n} "
            f"({err:.1%} > 4-sigma band)")


def test_portable_quantile_within_bin_tolerance(spark):
    """c11_portable_quantile (r9): each histogram quantile must sit
    within 1.5 bin widths (±150) of the exact percentile — the bin
    midpoint is ±0.5 bins from any member of its bin, and the
    histogram's CEIL(n·p) rank convention vs Spark percentile()'s
    (1+(n-1)·p) interpolation can differ by up to one rank, whose
    value may lie one bin over. Pins the cumulative-count read-off
    logic without depending on in-bin distribution."""
    approx = {
        r.returnflag: (r.p25_price, r.p50_price, r.p75_price)
        for r in registry.QUERIES["c11_portable_quantile"](
            spark, SF_DIR).collect()
    }
    exact = {
        r.returnflag: (r.p25, r.p50, r.p75)
        for r in (
            table(spark, SF_DIR, "lineitem")
            .filter("l_extendedprice IS NOT NULL")
            .groupBy("l_returnflag")
            .agg(
                F.expr("percentile(l_extendedprice, 0.25D)").alias("p25"),
                F.expr("percentile(l_extendedprice, 0.5D)").alias("p50"),
                F.expr("percentile(l_extendedprice, 0.75D)").alias("p75"),
            )
            .withColumnRenamed("l_returnflag", "returnflag")
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for flag, (a25, a50, a75) in approx.items():
        for a, e in zip((a25, a50, a75), exact[flag]):
            assert abs(a - e) <= 150.0, (
                f"{flag}: histogram quantile {a} vs exact {e} — "
                f"off by more than 1.5 bin widths")
