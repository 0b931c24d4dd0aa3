"""Unit contract for the shared event-log walk (evlog.py, r12) —
bench.py's metrics and shuffle_audit's byte ratios both ride this
parse, so its field handling is pinned against a synthetic log."""

import json
import os

from nyc_taxi_data_engineering_project_spark.evlog import group_task_metrics


def _write_log(tmp_path, lines):
    d = tmp_path / "ev"
    os.makedirs(d)
    with open(d / "app-1", "w") as fh:
        for ln in lines:
            fh.write(json.dumps(ln) + "\n")
    return str(d)


def test_groups_sum_cpu_and_shuffle(tmp_path):
    log = [
        {"Event": "SparkListenerJobStart", "Stage IDs": [1, 2],
         "Properties": {"spark.jobGroup.id": "k1::rep0"}},
        {"Event": "SparkListenerJobStart", "Stage IDs": [3],
         "Properties": {"spark.jobGroup.id": "k2::rep0"}},
        {"Event": "SparkListenerTaskEnd", "Stage ID": 1,
         "Task Metrics": {"Executor CPU Time": 2_000_000_000,
                          "Shuffle Write Metrics":
                              {"Shuffle Bytes Written": 100}}},
        {"Event": "SparkListenerTaskEnd", "Stage ID": 2,
         "Task Metrics": {"Executor CPU Time": 500_000_000}},
        {"Event": "SparkListenerTaskEnd", "Stage ID": 3,
         "Task Metrics": {"Executor CPU Time": 1_000_000_000,
                          "Shuffle Write Metrics":
                              {"Shuffle Bytes Written": 7}}},
        # stage with no group: ignored, not crashed on
        {"Event": "SparkListenerTaskEnd", "Stage ID": 99,
         "Task Metrics": {"Executor CPU Time": 9_000_000_000}},
        # ungrouped job (no Properties): ignored
        {"Event": "SparkListenerJobStart", "Stage IDs": [50]},
        # malformed line must be skipped, not fatal
    ]
    evdir = _write_log(tmp_path, log)
    with open(os.path.join(evdir, "app-1"), "a") as fh:
        fh.write("{not json\n")
    got = group_task_metrics(evdir)
    assert got == {
        "k1::rep0": {"task_cpu_s": 2.5, "shuffle_bytes": 100},
        "k2::rep0": {"task_cpu_s": 1.0, "shuffle_bytes": 7},
    }


def test_missing_metrics_blocks_are_zero(tmp_path):
    log = [
        {"Event": "SparkListenerJobStart", "Stage IDs": [1],
         "Properties": {"spark.jobGroup.id": "g"}},
        {"Event": "SparkListenerTaskEnd", "Stage ID": 1,
         "Task Metrics": None},
        {"Event": "SparkListenerTaskEnd", "Stage ID": 1},
    ]
    got = group_task_metrics(_write_log(tmp_path, log))
    assert got == {"g": {"task_cpu_s": 0.0, "shuffle_bytes": 0}}
