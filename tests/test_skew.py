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


def test_salted_join_deterministic_under_task_retry(tmp_path):
    """skew.py:55's retry-determinism claim, observed instead of argued
    (r5 verdict ask 4): a pass-through mapInPandas on the fact side
    raises on the FIRST attempt of partition 0, so the salt-deriving
    stage provably fails once and re-runs. Runs as a subprocess because
    retries need a ``local[4,2]`` master (the shared session's plain
    ``local[N]`` makes the first task failure fatal). The probe asserts
    the injection fired (marker file), the salted join equals both the
    clean salted run and the plain join, and — the discriminating check
    — the per-row salt ASSIGNMENTS are identical with and without the
    retry."""
    import json
    import subprocess
    import sys

    marker = str(tmp_path / "injection_fired")
    probe = os.path.join(os.path.dirname(__file__),
                         "retry_determinism_probe.py")
    proc = subprocess.run(
        [sys.executable, probe, SF_DIR, marker],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"probe failed\nstdout: {proc.stdout[-2000:]}\n"
        f"stderr: {proc.stderr[-2000:]}"
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["injection_fired"], "failure injection never fired"
    assert out["rows"] > 0
    assert out["matches_clean_salted"]
    assert out["matches_plain_join"]
    assert out["salt_assignments_identical"]


def test_aqe_splits_skewed_sort_merge_join(spark):
    """AQE's runtime skew split — the engine-native mitigation salting
    complements. A fact frame with one hot key (>90% of rows) joined
    sort-merge must come out of adaptive execution with the hot
    partition split (``skew=true`` on the SMJ node), given thresholds
    scaled down to test data volume. This is the observable form of the
    'AQE for runtime re-plan' posture in SCALE.md §3b."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F

        # 200k rows on one key + 10k spread over 1k keys
        fact = spark.range(210_000).select(
            F.when(F.col("id") < 200_000, 1)
            .otherwise(F.col("id") % 1_000).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        joined = fact.join(dim.hint("merge"), "k")
        # collect() drives THIS Dataset's QueryExecution to its final
        # adaptive plan (count() would plan a separate aggregate query)
        assert len(joined.collect()) == 210_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, (
            "AQE did not split the hot partition:\n" + final_plan[:2000]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_never_splits_aggregate_skew(spark):
    """The boundary of skew.py's decision rule #4: AQE's
    OptimizeSkewedJoin acts on JOINS ONLY — a skewed aggregate
    partition is never split, even with the same aggressive thresholds
    that make the join test above fire. What saves the skewed
    aggregate instead is partial aggregation (both HashAggregate
    levels in the plan): each map task collapses the hot key to one
    row before the shuffle moves anything — which is why salting
    combinable aggregates is a measured anti-pattern
    (stress100_results/aqe_vs_salting_60m.json: two-level 1.7×
    SLOWER)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F

        fact = spark.range(210_000).select(
            F.when(F.col("id") < 200_000, 1)
            .otherwise(F.col("id") % 1_000).alias("k"),
            F.col("id").alias("payload"),
        )
        agg = fact.groupBy("k").agg(F.sum("payload").alias("s"))
        rows = agg.collect()
        assert len(rows) == 1_000
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan
        # partial aggregation is the actual mitigation: two
        # HashAggregate levels around the Exchange
        assert plan.count("HashAggregate") >= 2
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_salted_join_null_keys_and_dup_dim_rows(spark, how):
    """The two key shapes the lineitem/orders fixture cannot produce,
    pinned against the plain join for every supported type:

    - NULL join keys — the canonical sentinel hot key that motivates
      salting in the first place. SQL equality never matches null, so
      null-key fact rows must drop (inner/semi), survive null-padded
      (left), or be emitted (anti) — identically with and without salt.
    - DUPLICATE dim keys — a non-unique dim multiplies matching fact
      rows; each dim duplicate is replicated once per salt value, so a
      fact row must meet every duplicate exactly once, not once per
      replica."""
    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "hot1"), (None, "hot2"),
         (3, "d"), (None, "hot3")],
        "k long, payload string",
    )
    dim = spark.createDataFrame(
        [(1, "x"), (1, "y"), (3, "z"), (None, "dimnull"), (4, "w")],
        "k long, attr string",
    )
    plain = fact.join(dim, on=["k"], how=how)
    salted = salted_join(fact, dim, on=["k"], n_salt=5, how=how)
    assert sorted(salted.columns) == sorted(plain.columns)

    def rows(df):  # key=repr: None is unorderable against ints
        cols = sorted(df.columns)
        return sorted((tuple(r) for r in df.select(*cols).collect()),
                      key=repr)

    assert rows(salted) == rows(plain)
