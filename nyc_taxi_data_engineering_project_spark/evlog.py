"""Spark event-log walk shared by bench.py and scripts/shuffle_audit.py
(r12 review: the JobStart stage→group map + TaskEnd metric sum lived as
two copies that had already diverged — bench's had CPU time, the
audit's didn't; one parser, two consumers now).

The event log is the one per-task metrics source that needs no custom
listener or callback server: jobs are attributed to whatever
``spark.sparkContext.setJobGroup(...)`` was active on the submitting
thread, so each consumer tags its work and reads its groups back here.

r13 (verdict ask 1): jobs launched from OTHER threads — streaming
microbatches, whose MicroBatchExecution thread sets its OWN job group
(the query runId) — used to fall outside their key's group, so the
D keys read ≈0 task-CPU against multi-second walls. Consumers that run
work SEQUENTIALLY can now pass ``windows`` ({tag: (start_ms, end_ms)},
driver-clock epoch millis): any job whose group is NOT a window tag is
re-attributed to the window containing its JobStart "Submission Time".
Sequential execution makes the windows disjoint, so the re-attribution
is exact — every job a key triggers, from any thread, lands on the key.
"""

from __future__ import annotations

import json
import os


def group_task_metrics(
    evlog_dir: str,
    windows: dict[str, tuple[float, float]] | None = None,
) -> dict[str, dict[str, float]]:
    """job-group -> {"task_cpu_s": float, "shuffle_bytes": int,
    "python_worker_s": float}, summed over every task of every stage of
    the group's jobs. With ``windows``, jobs whose group is not itself
    a window tag (streaming runId groups, untagged jobs) are folded
    into the tag whose [start_ms, end_ms) window contains their
    submission time.

    ``python_worker_s`` (r14, verdict ask 6) closes the Python-worker
    blind spot: "Executor CPU Time" is JVM CPU only, so Arrow/Pandas/
    row-Python keys (e1–e6, f12, f19/f20, f28, d13) read near-zero
    task-CPU while their real work runs in Python workers. The
    BatchEvalPython/ArrowEvalPython/MapInPandas operators publish a
    per-task "time to run Python workers" SQL-metric accumulable
    (milliseconds) in the TaskEnd's Task Info; summing its per-task
    Update deltas per group gives wall-clock Python-worker time
    attributable to the key. Start/initialize-worker accumulables are
    deliberately excluded — they are one-off pool-warming waits, not
    per-key work.

    ``python_worker_bytes`` (same ask): the Python DATA SOURCE scan
    path (d13's PythonScan node) publishes no timing accumulable at
    all in Spark 4.1 — only "data sent to/returned from Python
    workers" byte counters — so a Python-source key would still read
    0 under the time column. The byte column (sent + returned, summed)
    is the structural evidence of Python-worker activity for that
    path, and a useful Arrow-transfer-volume signal for the Pandas
    keys besides."""
    paths = []
    for root, _dirs, files in os.walk(evlog_dir):
        paths += [os.path.join(root, f) for f in files
                  if not f.startswith((".", "appstatus"))]
    out: dict[str, dict[str, float]] = {}
    for path in paths:
        # stage→group scope is PER FILE (r12 ADVICE): one file is one
        # application's log, and stage IDs restart per application —
        # a shared map across files would collide when a directory
        # holds more than one app (or os.walk orders TaskEnds first)
        stage_group: dict[int, str] = {}
        with open(path) as fh:
            for line in fh:
                if '"SparkListenerJobStart"' in line:
                    try:
                        ev = json.loads(line)
                        grp = (ev.get("Properties") or {}).get(
                            "spark.jobGroup.id")
                        if windows is not None and grp not in windows:
                            sub = ev.get("Submission Time")
                            grp = _window_tag(windows, sub)
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
                            grp, {"task_cpu_s": 0.0, "shuffle_bytes": 0,
                                  "python_worker_s": 0.0,
                                  "python_worker_bytes": 0})
                        d["task_cpu_s"] += int(
                            tm.get("Executor CPU Time", 0)) / 1e9
                        d["shuffle_bytes"] += int(
                            sw.get("Shuffle Bytes Written", 0))
                        for acc in (ev.get("Task Info") or {}).get(
                                "Accumulables", []):
                            nm = acc.get("Name")
                            try:
                                if nm == "time to run Python workers":
                                    d["python_worker_s"] += \
                                        int(acc.get("Update", 0)) / 1e3
                                elif nm in (
                                        "data sent to Python workers",
                                        "data returned from Python "
                                        "workers"):
                                    d["python_worker_bytes"] += \
                                        int(acc.get("Update", 0))
                            except (TypeError, ValueError):
                                pass
                    except (ValueError, json.JSONDecodeError):
                        continue
    return out


def _window_tag(windows, submission_ms):
    """The tag whose [start, end) window holds ``submission_ms``, or
    None (job outside every window — warm-up, inter-key housekeeping)."""
    if submission_ms is None:
        return None
    t = float(submission_ms)
    for tag, (lo, hi) in windows.items():
        if lo <= t < hi:
            return tag
    return None
