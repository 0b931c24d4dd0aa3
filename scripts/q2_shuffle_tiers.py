"""tpch_q2 shuffle growth across tiers (r11, verdict ask 4).

SHUFFLE_AUDIT.json flagged q2 as the board's only super-linear shuffle
outlier: 16.5× bytes on 10× input (sf0.01→sf0.1) vs ~10-11× for every
other join-heavy key — 2.5 MB absolute, metadata-scale, but worth a
tier check before calling it noise or a plan defect. Hypothesis from
the verdict: the (partkey, suppkey) cost-aggregate output crosses a
broadcast/SMJ boundary between tiers (supplier is broadcastable at
sf0.01 but not above, so the small tier UNDER-counts shuffle and the
ratio over-states growth — a denominator artifact, not super-linear
scaling).

Measures, per tier (sf0.1 direct; K=100 and K=1000 replicated corpora
via the stress_tpch rekey): total shuffle bytes written by q2's jobs
(event-log truth, same mechanism as shuffle_audit.py), wall, rows,
and which join strategy the supplier-side joins planned. Growth is
judged K=100 → K=1000 (10× input at REAL scale, both sides past every
broadcast threshold).

Run: python scripts/q2_shuffle_tiers.py [K ...]   (default: 100 1000)
Artifact: scripts/stress100_results/q2_shuffle_tiers.json
"""

from __future__ import annotations

import contextlib
import io as _io
import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from shuffle_audit import group_shuffle_bytes  # noqa: E402

from nyc_taxi_data_engineering_project_spark import catalog  # noqa: E402
from nyc_taxi_data_engineering_project_spark.queries.tpch import tpch_q2  # noqa: E402
from nyc_taxi_data_engineering_project_spark.session import (  # noqa: E402
    driver_memory_for,
    get_session,
    shuffle_partitions_for,
)

KS = [int(a) for a in sys.argv[1:]] or [100, 1000]
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# ONE copy of the replication rules (r11 review): the rekey map and
# shift constant live in stress_tpch — a second copy here would let
# the corpora silently diverge and this probe's q2 adjudication would
# stop measuring the battery's workload
from stress_tpch import _FIXED, _REKEY, _SHIFT  # noqa: E402


def materialize(spark, k: int, work: str) -> None:
    os.makedirs(work, exist_ok=True)
    for name in _FIXED:
        shutil.copy(f"{SRC}/{name}.parquet", f"{work}/{name}.parquet")
    for name, keys in _REKEY.items():
        df = catalog.table(spark, SRC, name)
        df = df.withColumn(
            "_i", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        for kcol in keys:
            df = df.withColumn(kcol, F.col(kcol) + F.col("_i") * _SHIFT)
        df.drop("_i").write.mode("overwrite").parquet(
            f"{work}/{name}.parquet")


def join_strategies(df) -> dict[str, int]:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return {
        "broadcast_hash_join": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_join": len(re.findall(r"SortMergeJoin", plan)),
        "shuffled_hash_join": len(re.findall(r"ShuffledHashJoin", plan)),
    }


def main() -> None:
    # ONE JVM serves every tier: heap for the largest K up front
    # (the engine rule: 2× the ~K×11 MB corpus bytes)
    if "SPARK_GRAFT_DRIVER_MEM" not in os.environ:
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = driver_memory_for(
            max(KS) * (11 << 20))
    evlog = tempfile.mkdtemp(prefix="q2_tiers_ev_")
    spark = get_session("q2-shuffle-tiers", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{evlog}",
        # group_shuffle_bytes reads the log as JSON lines — Spark 4
        # compresses event logs by default
        "spark.eventLog.compress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    tiers: list[tuple[str, str, bool]] = [("sf0.1", SRC, False)]
    for k in KS:
        work = f"/tmp/q2_tiers_k{k}"
        if not os.path.exists(f"{work}/lineitem.parquet"):
            t0 = time.time()
            materialize(spark, k, work)
            print(f"materialized K={k} in {time.time()-t0:.0f}s",
                  flush=True)
        tiers.append((f"K={k}", work, True))

    rows = {}
    for label, d, cleanup in tiers:
        n_shuffle = shuffle_partitions_for(d)
        spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
        df = tpch_q2(spark, d)
        strat = join_strategies(df)
        sc.setJobGroup(label, label)
        t0 = time.time()
        n = df.count()
        wall = round(time.time() - t0, 1)
        sc.setJobGroup("", "")
        rows[label] = {"rows": n, "wall_s": wall,
                       "shuffle_partitions": n_shuffle,
                       "join_strategies_planned": strat}
        print(f"{label}: rows={n} wall={wall}s strategies={strat}",
              flush=True)
        if cleanup and os.environ.get("SPARK_GRAFT_Q2_KEEP", "") != "1":
            shutil.rmtree(d, ignore_errors=True)

    spark.stop()
    time.sleep(1)
    by_group = group_shuffle_bytes(evlog)
    shutil.rmtree(evlog, ignore_errors=True)
    for label in rows:
        rows[label]["shuffle_bytes"] = by_group.get(label, 0)
    labels = [t[0] for t in tiers]
    for a, b in zip(labels, labels[1:]):
        sa, sb = rows[a]["shuffle_bytes"], rows[b]["shuffle_bytes"]
        rows[b]["growth_vs_prev"] = round(sb / sa, 2) if sa else None

    out = {"tiers": rows, "order": labels,
           "note": ("growth is judged on the K=100->K=1000 step (10x "
                    "input with all join strategies settled); the "
                    "sf0.01->sf0.1 16.5x in SHUFFLE_AUDIT.json includes "
                    "broadcast-threshold crossings that shrink the "
                    "denominator")}
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "stress100_results", "q2_shuffle_tiers.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
