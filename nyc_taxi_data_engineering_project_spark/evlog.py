"""Spark event-log walk shared by bench.py and scripts/shuffle_audit.py
(r12 review: the JobStart stage→group map + TaskEnd metric sum lived as
two copies that had already diverged — bench's had CPU time, the
audit's didn't; one parser, two consumers now).

The event log is the one per-task metrics source that needs no custom
listener or callback server: jobs are attributed to whatever
``spark.sparkContext.setJobGroup(...)`` was active on the submitting
thread, so each consumer tags its work and reads its groups back here.
Known limit (documented at both call sites): jobs launched from OTHER
threads — streaming microbatches — fall outside their key's group.
"""

from __future__ import annotations

import json
import os


def group_task_metrics(evlog_dir: str) -> dict[str, dict[str, float]]:
    """job-group -> {"task_cpu_s": float, "shuffle_bytes": int},
    summed over every task of every stage of the group's jobs."""
    paths = []
    for root, _dirs, files in os.walk(evlog_dir):
        paths += [os.path.join(root, f) for f in files
                  if not f.startswith((".", "appstatus"))]
    stage_group: dict[int, str] = {}
    out: dict[str, dict[str, float]] = {}
    for path in paths:
        with open(path) as fh:
            for line in fh:
                if '"SparkListenerJobStart"' in line:
                    try:
                        ev = json.loads(line)
                        grp = (ev.get("Properties") or {}).get(
                            "spark.jobGroup.id")
                        if grp:
                            for sid in ev.get("Stage IDs", []):
                                stage_group[int(sid)] = grp
                    except (ValueError, json.JSONDecodeError):
                        continue
                elif '"SparkListenerTaskEnd"' in line:
                    try:
                        ev = json.loads(line)
                        grp = stage_group.get(int(ev.get("Stage ID", -1)))
                        if grp is None:
                            continue
                        tm = ev.get("Task Metrics") or {}
                        sw = tm.get("Shuffle Write Metrics") or {}
                        d = out.setdefault(
                            grp, {"task_cpu_s": 0.0, "shuffle_bytes": 0})
                        d["task_cpu_s"] += int(
                            tm.get("Executor CPU Time", 0)) / 1e9
                        d["shuffle_bytes"] += int(
                            sw.get("Shuffle Bytes Written", 0))
                    except (ValueError, json.JSONDecodeError):
                        continue
    return out
