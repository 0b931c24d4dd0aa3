"""K=1000 q5 through a PLAIN get_session — the heap rule's end-to-end
proof (r11, verdict ask 3).

r10's K=1000 battery OOM'd q5's shuffle at the unset-default 8 g
driver heap and was hand-fixed (20 g harness default). The rule now
lives in the engine (session.driver_memory_for: 2× input bytes,
clamped [8 g, 64 g], derived from the same walk that sizes shuffle
partitions and the AQE skew gate). This probe is the done-criterion
run: a fresh process, NO SPARK_GRAFT_DRIVER_MEM, a bare
``get_session(sf_dir=corpus)`` — the session must come up with the
derived heap and q5 must run green.

Usage: python scripts/q5_heap_rule_probe.py [corpus_dir]
       (default /tmp/q2_tiers_k1000 — materialize it first via
        SPARK_GRAFT_Q2_KEEP=1 python scripts/q2_shuffle_tiers.py)
Artifact: scripts/stress100_results/q5_heap_rule.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/q2_tiers_k1000"


def main() -> None:
    # the probe's whole point: the ENGINE sizes the heap, nobody else
    assert "SPARK_GRAFT_DRIVER_MEM" not in os.environ, (
        "unset SPARK_GRAFT_DRIVER_MEM — this probe proves the derived "
        "floor, not an override")
    if not os.path.exists(os.path.join(CORPUS, "lineitem.parquet")):
        raise SystemExit(
            f"{CORPUS} has no lineitem.parquet — materialize the tier "
            f"first (SPARK_GRAFT_Q2_KEEP=1 scripts/q2_shuffle_tiers.py)")

    from nyc_taxi_data_engineering_project_spark.queries.tpch import tpch_q5
    from nyc_taxi_data_engineering_project_spark.session import (
        _input_bytes,
        driver_memory_for,
        get_session,
    )

    nbytes = _input_bytes(CORPUS)
    expect = driver_memory_for(nbytes)
    spark = get_session("q5-heap-rule", sf_dir=CORPUS)
    spark.sparkContext.setLogLevel("ERROR")
    got = spark.conf.get("spark.driver.memory")
    print(f"corpus={CORPUS} bytes={nbytes} derived_heap={expect} "
          f"session_heap={got} shuffle_partitions="
          f"{spark.conf.get('spark.sql.shuffle.partitions')}", flush=True)
    assert got == expect, (got, expect)

    # ONE full execution (r11 review): q5's result is a tiny aggregate,
    # so a count() is a full-plan evaluation AND the row evidence — a
    # separate noop pass would double a multi-minute 11 GB shuffle for
    # no extra measurement
    t0 = time.time()
    n = tpch_q5(spark, CORPUS).count()
    wall = round(time.time() - t0, 1)
    print(f"q5: {n} rows, {wall}s — green through the derived heap",
          flush=True)
    out = {"corpus": CORPUS, "input_bytes": nbytes,
           "derived_heap": expect, "session_heap": got,
           "shuffle_partitions":
               int(spark.conf.get("spark.sql.shuffle.partitions")),
           "q5_rows": n, "q5_wall_s": wall,
           "note": ("r10's q5 OOM tier (8g default) now runs green "
                    "through a bare get_session(sf_dir=...) — the heap "
                    "floor is engine-derived, no hand sizing")}
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "stress100_results", "q5_heap_rule.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
