"""Spill-path evidence for the sort-merge salted join (r5 verdict ask 5).

The 100x fix replaced c33's forced `shuffle_hash` (non-spillable build
side -> per-task OOM at K=100, SCALE.md §10 finding 1) with a `merge`
hint on the argument that sort-merge SPILLS under memory pressure. That
argument was prose; this probe observes it: run ONLY the c33 key
against the K=100 stress materialization in a deliberately
memory-constrained session (default 2g heap across local[32] — ~40 MB
of execution memory per concurrent sort task against a 16x-replicated
~15M-row orders side), and assert from the Spark event log that the
join COMPLETED with memoryBytesSpilled/diskBytesSpilled > 0. Mere
no-OOM at the default 8g would not prove the spill path ever executed.

Prereq: a materialized stress corpus (python scripts/stress100.py 100
builds /tmp/spark_graft_stress100). Run:

    python scripts/spill_probe.py [workdir] [heap]

Emits one JSON line {completed, secs, rows, memory_spilled_bytes,
disk_spilled_bytes, spill_tasks}; exit 1 unless completed AND both
spill counters are positive. Result recorded in SCALE.md §10.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_stress100"
HEAP = sys.argv[2] if len(sys.argv) > 2 else "2g"
# 8 threads, not 32: the probe wants memory pressure to land on the
# SORT (the spillable path under test), and per-task execution memory is
# heap-proportional/concurrency-inverse. At 32 threads on a 2g heap the
# unspillable parquet-reader column batches of 32 concurrent scan tasks
# exhaust the heap before any sort runs — an OOM that says nothing about
# the join. ~150 MB/task at 8×2g puts the ~225 MB post-salt per-task
# sorts firmly into the spill path instead.
CPUS = sys.argv[3] if len(sys.argv) > 3 else "8"
EVLOG = f"{WORK}/evlog_spill"


def spill_from_eventlog(evlog_dir: str) -> tuple[int, int, int]:
    """(memory_spilled, disk_spilled, n_spilling_tasks) summed over all
    SparkListenerTaskEnd metrics in the event log."""
    mem = disk = n = 0
    paths = []
    for root, _dirs, files in os.walk(evlog_dir):
        paths += [os.path.join(root, f) for f in files
                  if not f.startswith((".", "appstatus"))]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    metrics = json.loads(line).get("Task Metrics") or {}
                    m = int(metrics.get("Memory Bytes Spilled", 0))
                    d = int(metrics.get("Disk Bytes Spilled", 0))
                except (KeyError, ValueError, json.JSONDecodeError):
                    continue
                mem += m
                disk += d
                n += m > 0 or d > 0
    return mem, disk, n


def main() -> None:
    for t in ("lineitem", "orders"):
        if not os.path.isdir(f"{WORK}/{t}.parquet"):
            print(f"missing {WORK}/{t}.parquet — run scripts/stress100.py "
                  "first to materialize the stress corpus")
            sys.exit(2)
    if os.path.isdir(EVLOG):
        shutil.rmtree(EVLOG)
    os.makedirs(EVLOG)

    from nyc_taxi_data_engineering_project_spark import registry
    from nyc_taxi_data_engineering_project_spark.session import get_session

    registry.load_all()
    spark = get_session(
        "spill-probe",
        cpus=CPUS,
        extra_conf={
            # driver memory IS executor memory in local mode; must land
            # before the JVM starts, hence a dedicated process
            "spark.driver.memory": HEAP,
            # get_session ties shuffle.partitions to the thread count,
            # which at 8 threads gives ~30M-row per-task sorts over the
            # 16x-replicated dim — more than even a spilling sorter's
            # in-memory bookkeeping can hold in a 150 MB task budget.
            # The memory-constrained posture SCALE.md documents is more,
            # smaller partitions; 64 here puts each sort a few times
            # over the task budget: it must spill AND must complete.
            "spark.sql.shuffle.partitions": "64",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVLOG}",
            "spark.eventLog.compress": "false",
        },
    )
    t0 = time.time()
    out = {"completed": False}
    try:
        rows = registry.QUERIES["c33_salted_join"](spark, WORK).collect()
        out = {"completed": True, "secs": round(time.time() - t0, 1),
               "rows": len(rows)}
    except Exception as exc:  # noqa: BLE001
        out["err"] = str(exc)[:300]
    spark.stop()  # flush the event log
    time.sleep(1)
    mem, disk, n = spill_from_eventlog(EVLOG)
    out.update({"heap": HEAP, "memory_spilled_bytes": mem,
                "disk_spilled_bytes": disk, "spill_tasks": n})
    print(json.dumps(out))
    ok = out["completed"] and mem > 0 and disk > 0
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
