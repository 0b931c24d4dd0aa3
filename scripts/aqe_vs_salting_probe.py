"""AQE-vs-salting decision evidence (r9, verdict ask 4).

Modern Spark has TWO skew mitigations and a 100 TB operator needs to
know which to reach for:

- **AQE skew-join split** (runtime): splits an oversized shuffle
  partition of a sort-merge/shuffled-hash JOIN and replicates the other
  side's matching partition. Zero code, adapts to the actual data.
- **Explicit salting** (plan-level, skew.salted_join): spreads a hot
  key over n_salt reducers by widening the join key. Costs a dim-side
  replication, works anywhere a join key can be widened — including
  the places AQE cannot see.

This probe PLANTS the skew at stress scale and measures three
scenarios that pin the decision rule:

A. **Skewed shuffle JOIN** (hot key = ~half the fact): AQE-off (the
   straggler baseline) vs AQE skew split vs salted_join. Expectation:
   AQE ≈ salted, both >> AQE-off; AQE wins on simplicity → default.
B. **Skewed AGGREGATE** (groupBy on the hot key): AQE's
   OptimizeSkewedJoin handles JOINS ONLY — a skewed partial-agg
   partition is never split (asserted in tests/test_skew.py). The fix
   is the two-level / finer-key aggregate (q21's (orderkey,suppkey) →
   orderkey split, f31's bucketed rank) — i.e. salting the GROUP key.
C. Bucketed scans: no Exchange exists for AQE to re-split — measured
   in r8 (SCALE.md §15c: 32-bucket starvation at K=1000). Recorded
   there; not re-run here.

Run: python scripts/aqe_vs_salting_probe.py [n_rows] → one JSON line.

``--materialized`` (r10, verdict ask 1): the end-to-end gate for the
OPERATIONALIZED rule — the planted tables are written to parquet, a
PLAIN ``get_session(sf_dir=<that dir>)`` session is opened (no manual
skew confs: the thresholds come from session.aqe_skew_conf_for's
input-bytes walk), and the probe asserts the skew split actually
FIRES (``skew=true`` on the SMJ node) and re-measures the join.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_engineering_project_spark.session import get_session  # noqa: E402
from nyc_taxi_data_engineering_project_spark.skew import salted_join  # noqa: E402

_ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(_ARGS[0]) if _ARGS else 60_000_000
HOT_FRACTION = 0.5
N_DIM = 2_000_000  # too big to broadcast at default threshold


def planted_fact(spark, hot_fraction: float = HOT_FRACTION):
    """~N rows, ``hot_fraction`` of them on key 7, rest uniform over
    N_DIM keys — the celebrity/sentinel-key shape."""
    hot = int(N * hot_fraction)
    return spark.range(N).select(
        F.when(F.col("id") < hot, 7)
        .otherwise(F.col("id") % N_DIM).alias("k"),
        (F.col("id") * 3 % 1000).alias("payload"),
    )


def planted_dim(spark):
    return spark.range(N_DIM).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("attr"))


def timed(df) -> float:
    """Execute THIS Dataset fully through the noop sink (JVM-side, no
    driver transfer, no count()-style column pruning)."""
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def skew_split_fired(df) -> bool:
    """Whether AQE's skew split fires for df's join: execute a sampled
    twin of the SAME plan (the join runs in full; the sample discards
    rows before the driver) and read ITS finalized adaptive plan.
    Neither count() nor a write exposes the executed plan of the
    Dataset itself — both wrap a separate QueryExecution."""
    probe = df.sample(0.000001)
    probe.collect()
    return "skew=true" in probe._jdf.queryExecution() \
        .executedPlan().toString()


def materialized_main() -> None:
    """End-to-end gate: the derived skew confs (from a plain
    ``get_session(sf_dir=...)``) make the split fire on parquet-backed
    planted skew — no per-query tuning."""
    import shutil
    import tempfile

    from nyc_taxi_data_engineering_project_spark.session import (
        aqe_skew_conf_for,
    )

    data_dir = os.path.join(tempfile.gettempdir(), "aqe_probe_sf")
    shutil.rmtree(data_dir, ignore_errors=True)

    spark = get_session("aqe-probe-writer")
    spark.sparkContext.setLogLevel("ERROR")
    planted_fact(spark).write.parquet(
        os.path.join(data_dir, "fact.parquet"))
    planted_dim(spark).write.parquet(
        os.path.join(data_dir, "dim.parquet"))
    spark.stop()

    # the session under test: NOTHING set by hand except disabling the
    # broadcast dodge (the rule is about joins whose dim CAN'T
    # broadcast) — shuffle partitions AND skew gates come from the walk
    spark = get_session("aqe-probe-materialized", sf_dir=data_dir)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    derived = aqe_skew_conf_for(data_dir)
    for k, v in derived.items():
        assert spark.conf.get(k) == v, (k, spark.conf.get(k), v)

    fact = spark.read.parquet(os.path.join(data_dir, "fact.parquet"))
    dim = spark.read.parquet(os.path.join(data_dir, "dim.parquet"))
    mk_join = lambda: fact.join(  # noqa: E731
        dim.hint("merge"), "k").select("payload", "attr")

    reps = int(os.environ.get("REPS", "2"))
    times = [timed(mk_join()) for _ in range(reps)]
    fired = skew_split_fired(mk_join())

    # contrast: the same session forced back to the DEFAULT gate the
    # rule replaces (256 MB threshold / 64 MB advisory — the setting
    # that silently never fired in the in-memory probe)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256MB")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    default_times = [timed(mk_join()) for _ in range(reps)]
    default_fired = skew_split_fired(mk_join())
    for k, v in derived.items():
        spark.conf.set(k, v)

    out = {
        "mode": "materialized_plain_get_session",
        "n_rows": N, "hot_fraction": HOT_FRACTION, "n_dim": N_DIM,
        "derived_conf": derived,
        "shuffle_partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"),
        "join_secs": min(times), "join_reps": times,
        "skew_split_fired": fired,
        "default_gate_secs": min(default_times),
        "default_gate_reps": default_times,
        "default_gate_split_fired": default_fired,
    }
    print(json.dumps(out), flush=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "stress100_results", "aqe_session_gate_60m.json")
    with open(art, "w") as f:
        json.dump(out, f)
        f.write("\n")
    assert fired, (
        "the derived skew gate did NOT fire through a plain "
        f"get_session(sf_dir=...): {out}")
    spark.stop()
    shutil.rmtree(data_dir, ignore_errors=True)


def crossover_main() -> None:
    """r14 (verdict ask 5): the CROSSOVER measurement — when does
    c33-style explicit salting beat AQE's skew split at tier? Two arms
    over a hot-fraction sweep at the K=100-equivalent row count (60 M
    fact, 2 M dim, no broadcast):

    - **exchange-present** (plain shuffle SMJ): AQE with the session's
      derived byte gates vs salted_join(16). Expectation from §17: AQE
      wins at every fraction once it fires (salting pays the n_salt×
      dim replication AQE doesn't) — this arm PINS that there is no
      fraction where salting wins when an Exchange exists.
    - **exchange-free** (both sides bucketed on the key — the layout
      path, where AQE structurally cannot split because there is no
      Exchange to re-plan): plain bucketed join (straggler-bound) vs
      salted_join (re-introduces an exchange, kills the straggler).
      The crossover hot-fraction where salting starts winning IS the
      decision rule for layout-served joins.

    Artifact: stress100_results/aqe_salting_crossover.json; the
    one-line rule lands in skew.py's docstring + SCALE.md §24b."""
    import shutil
    import tempfile

    from nyc_taxi_data_engineering_project_spark import io as _io
    from nyc_taxi_data_engineering_project_spark.session import (
        aqe_skew_conf_for,
    )

    fractions = [0.05, 0.1, 0.25, 0.5]
    reps = int(os.environ.get("REPS", "2"))
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    # the session-derived gates, computed from the planted volume
    # (~16 B/row in shuffle): what get_session(sf_dir=...) would set
    for k, v in aqe_skew_conf_for(N * 16).items():
        spark.conf.set(k, v)

    def best(mk):
        times = [timed(mk()) for _ in range(reps)]
        return min(times), times

    dim = planted_dim(spark)
    out: dict = {"n_rows": N, "n_dim": N_DIM, "fractions": {}}
    work = tempfile.mkdtemp(prefix="aqe_crossover_")
    try:
        for frac in fractions:
            fact = planted_fact(spark, frac)
            rec: dict = {}
            # ---- exchange-present arm
            rec["aqe_tuned"], rec["aqe_tuned_reps"] = best(
                lambda: fact.join(dim.hint("merge"), "k")
                .select("payload", "attr"))
            rec["aqe_split_fired"] = skew_split_fired(
                fact.join(dim.hint("merge"), "k")
                .select("payload", "attr"))
            rec["salted_16"], rec["salted_reps"] = best(
                lambda: salted_join(fact, dim, on=["k"], n_salt=16)
                .select("payload", "attr"))
            # ---- exchange-free arm: both sides bucketed on k
            ftbl, dtbl = f"xover_fact_{int(frac * 100)}", "xover_dim"
            _io.write_bucketed(
                fact, ftbl, "k", buckets=32,
                path=os.path.join(work, ftbl))
            if not spark.catalog.tableExists(dtbl):
                _io.write_bucketed(
                    dim, dtbl, "k", buckets=32,
                    path=os.path.join(work, dtbl))
            bf, bd = spark.table(ftbl), spark.table(dtbl)
            plan = (bf.join(bd, "k").select("payload", "attr")
                    ._jdf.queryExecution().executedPlan().toString())
            rec["bucketed_exchange_free"] = "Exchange" not in plan
            rec["bucketed_plain"], rec["bucketed_plain_reps"] = best(
                lambda: bf.join(bd, "k").select("payload", "attr"))
            # the salted alternative ABANDONS the bucket alignment on
            # purpose (a bucketed scan's HashPartitioning(k) already
            # satisfies ClusteredDistribution(k, salt), so salting the
            # catalog tables would silently skip the exchange and fix
            # nothing): read the same files WITHOUT bucket metadata and
            # pay the full salted shuffle to kill the straggler
            rf = spark.read.parquet(os.path.join(work, ftbl))
            rd = spark.read.parquet(os.path.join(work, dtbl))
            rec["bucketed_salted"], rec["bucketed_salted_reps"] = best(
                lambda: salted_join(rf, rd, on=["k"], n_salt=16)
                .select("payload", "attr"))
            rec["salting_wins_bucketed"] = (
                rec["bucketed_salted"] < rec["bucketed_plain"])
            rec["salting_wins_shuffle"] = (
                rec["salted_16"] < rec["aqe_tuned"])
            out["fractions"][str(frac)] = rec
            print(f"frac={frac}: {json.dumps(rec)}", flush=True)
            spark.sql(f"DROP TABLE IF EXISTS {ftbl}")
        spark.sql("DROP TABLE IF EXISTS xover_dim")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "stress100_results", "aqe_salting_crossover.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    out: dict = {"n_rows": N, "hot_fraction": HOT_FRACTION,
                 "n_dim": N_DIM, "scenarios": {}}

    # ---------------- scenario A: skewed shuffle join
    fact, dim = planted_fact(spark), planted_dim(spark)
    rec: dict = {}
    reps = int(os.environ.get("REPS", "2"))

    def best(mk):
        times = [timed(mk()) for _ in range(reps)]
        return min(times), times

    mk_join = lambda: fact.join(  # noqa: E731
        dim.hint("merge"), "k").select("payload", "attr")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    rec["aqe_off"], rec["aqe_off_reps"] = best(mk_join)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    rec["aqe_defaults"], rec["aqe_defaults_reps"] = best(mk_join)
    rec["aqe_defaults_split_fired"] = skew_split_fired(mk_join())

    # tuned: the default gate is (size > 5× median AND > 256 MB) — a
    # 30 M-row hot partition compresses under 256 MB and is silently
    # left whole. Scale the byte thresholds to the actual shuffle.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "32MB")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")
    rec["aqe_tuned"], rec["aqe_tuned_reps"] = best(mk_join)
    rec["aqe_tuned_split_fired"] = skew_split_fired(mk_join())
    spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    rec["salted_16"], rec["salted_reps"] = best(
        lambda: salted_join(fact, dim, on=["k"], n_salt=16)
        .select("payload", "attr"))
    out["scenarios"]["skewed_join"] = rec
    print(f"A skewed_join: {rec}", flush=True)

    # ---------------- scenario B: skewed aggregate (sum/count: exact,
    # losslessly re-aggregable — the two-level form must be value-
    # identical, not just row-count-identical)
    rec = {}

    def plain_agg():
        return fact.groupBy("k").agg(
            F.sum("payload").alias("s"), F.count(F.lit(1)).alias("n"))

    rec["plain_agg_aqe_on"], rec["plain_reps"] = best(plain_agg)

    def two_level():
        lvl1 = fact.withColumn(
            "_salt",
            F.pmod(F.monotonically_increasing_id(), F.lit(64)),
        ).groupBy("k", "_salt").agg(
            F.sum("payload").alias("s1"), F.count(F.lit(1)).alias("n1"))
        return lvl1.groupBy("k").agg(
            F.sum("s1").alias("s"), F.sum("n1").alias("n"))

    rec["two_level_salted"], rec["two_level_reps"] = best(two_level)
    rec["values_equal"] = (
        plain_agg().exceptAll(two_level()).count() == 0
        and two_level().exceptAll(plain_agg()).count() == 0
    )
    out["scenarios"]["skewed_aggregate"] = rec
    print(f"B skewed_aggregate: {rec}", flush=True)

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    if "--materialized" in sys.argv:
        materialized_main()
    elif "--crossover" in sys.argv:
        crossover_main()
    else:
        main()
