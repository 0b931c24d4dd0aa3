"""A15 layout PRODUCT-PATH evidence at stress scale (r8).

scripts/bucketed_workload_probe.py proved the bucketed layout's win
with hand-injected frames; this probe drives the shipped surface
instead: ``catalog.build_workload_layout`` once, then the ORDINARY
registry keys (tpch q3/q9/q18/q21) with the layout served
transparently by ``catalog.table()`` — timed against the plain path,
with shuffle-Exchange counts and result equality checked via the
in-engine hashed digest (``fx.hashed_result_digest`` — q18's K=100
result is ~1.5 M rows; no row crosses the driver).

Run: python scripts/workload_layout_probe.py [workdir] → one JSON line.
Requires the stress_tpch K=100 workdir to exist.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from nyc_taxi_data_engineering_project_spark import fx, registry  # noqa: E402
from nyc_taxi_data_engineering_project_spark.catalog import (  # noqa: E402
    LAYOUT_SERVE_CONF,
    build_workload_layout,
    drop_workload_layout,
)
from nyc_taxi_data_engineering_project_spark.session import (  # noqa: E402
    get_session,
    shuffle_partitions_for,
)

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_tpch100"
LAYOUT_DIR = os.path.join(WORK, "_layout_probe")
# long-haul subsets (the stress_tpch convention): run only these keys
KEYS = tuple(
    k for k in os.environ.get(
        "SPARK_GRAFT_LAYOUT_KEYS",
        "tpch_q3,tpch_q9,tpch_q18,tpch_q21").split(",") if k
)
# which layout family to build (r9: the dedup/ANN family probes pass
# documents,embeddings and their f-keys)
TABLES = tuple(
    t for t in os.environ.get(
        "SPARK_GRAFT_LAYOUT_TABLES", "orders,lineitem").split(",") if t
)
REPS = int(os.environ.get("REPS", "2"))


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def main() -> None:
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(shuffle_partitions_for(WORK)))
    registry.load_all()

    t0 = time.time()
    build_workload_layout(spark, WORK, LAYOUT_DIR, tables=TABLES)
    build_s = round(time.time() - t0, 2)

    try:
        out: dict = {"workdir": WORK, "api": "catalog.build_workload_layout",
                     "build_s": build_s, "queries": {}}
        for key in KEYS:
            rec: dict = {}
            digest = {}
            quanta = fx.column_quanta(registry.ORACLES[key])
            for variant, serve in (("plain", "false"), ("layout", "true")):
                spark.conf.set(LAYOUT_SERVE_CONF, serve)
                try:
                    secs = []
                    for _ in range(REPS):
                        t0 = time.time()
                        digest[variant] = fx.hashed_result_digest(
                            registry.QUERIES[key](spark, WORK), quanta)
                        secs.append(round(time.time() - t0, 2))
                    rec[variant] = {
                        "secs": min(secs), "reps": secs,
                        "exchanges": n_exchanges(
                            registry.QUERIES[key](spark, WORK)),
                    }
                finally:
                    spark.conf.unset(LAYOUT_SERVE_CONF)
            rec["rows"] = digest["plain"][0]
            rec["results_equal"] = digest["plain"] == digest["layout"]
            out["queries"][key] = rec
            print(f"  {key}: plain {rec['plain']['secs']}s/"
                  f"{rec['plain']['exchanges']}x vs layout "
                  f"{rec['layout']['secs']}s/{rec['layout']['exchanges']}x "
                  f"rows={rec['rows']} equal={rec['results_equal']}",
                  flush=True)
        print(json.dumps(out), flush=True)
    finally:
        drop_workload_layout(spark, WORK)
        shutil.rmtree(LAYOUT_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
