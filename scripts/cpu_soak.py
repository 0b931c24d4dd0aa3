"""CPU-baseline soak (r13, verdict ask 5): run the full bench board
N times CONSECUTIVELY in one quiet session-series and record the
per-key task-CPU spread, giving the "CPU is the noise-immune signal"
claim the same controlled evidence the wall band got in BASELINE.md
§22a. Each run is a fresh `python bench.py` process (fresh JVM — the
production recording posture, not a warm-loop best case); its
BENCH_DETAIL.json is copied aside, then the summary reports

- per-run totals: wall, task_cpu_s, shuffle MB;
- per-key CPU ratio max/min across runs, the worst offenders named;
- the count of keys whose CPU swings > 15% (the verdict's bar), split
  into Python-worker keys (Pandas/Arrow keys — executor CPU excludes
  the Python worker by definition, so their small JVM-side residue is
  expected to be relatively noisy) vs JVM keys.

Run:  python scripts/cpu_soak.py [n_runs]        (default 5)
Artifact: scripts/stress100_results/cpu_soak.json (+ per-run boards
cpu_soak_run{i}.json). Keep the box otherwise idle — that is the point.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# keys whose hot path runs INSIDE Python workers (Arrow/Pandas/row
# Python): executor task CPU misses that work by definition, so their
# recorded CPU is a small JVM-side residue — named explicitly so a
# >15% swing there is documented, not alarming
PYTHON_WORKER_KEYS = {
    "e1_py_udf", "e2_pandas_udf", "e3_apply_in_pandas", "e4_udaf",
    "e5_udtf", "e6_map_in_pandas", "f12_multimodal_decode",
    "f19_ml_tfidf_pipeline", "f20_ml_minhash_lsh", "f28_doc_clustering",
}


def spread_entry(cpus: list[float], python_worker: bool) -> dict:
    """One key's cross-run CPU spread row (r13 ADVICE: "ratio" is
    homogeneously float|null — the infinite-spread class is flagged by
    "infinite": true, never the string "inf")."""
    lo, hi = min(cpus), max(cpus)
    return {
        "cpu_runs": cpus,
        "ratio": round(hi / lo, 3) if lo > 0 else None,
        "infinite": lo == 0 and hi > 0,
        "python_worker": python_worker,
    }


def main() -> None:
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    runs = []
    for i in range(N):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO, capture_output=True, text=True)
        wall = round(time.time() - t0, 1)
        if proc.returncode != 0:
            print(f"run {i}: bench exited {proc.returncode}\n"
                  f"{proc.stderr[-2000:]}", flush=True)
            sys.exit(1)
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            detail = json.load(fh)
        dst = os.path.join(HERE, "stress100_results",
                           f"cpu_soak_run{i}.json")
        shutil.copy(os.path.join(REPO, "BENCH_DETAIL.json"), dst)
        m = detail.get("metrics", {})
        runs.append(m)
        print(f"run {i}: board wall {detail['value']}s (process {wall}s), "
              f"task_cpu {round(sum(v['task_cpu_s'] for v in m.values()), 1)}s, "
              f"shuffle {round(sum(v['shuffle_bytes'] for v in m.values()) / 1e6, 1)}MB, "
              f"{len(m)} keys with metrics", flush=True)

    keys = sorted(set.intersection(*[set(m) for m in runs]))
    spread = {}
    for k in keys:
        cpus = [m[k]["task_cpu_s"] for m in runs]
        # min == 0 with real CPU elsewhere is an INFINITE spread — the
        # attribution-gap class this soak exists to surface (a run
        # where a key's window fold missed) — not a key to drop from
        # the ranking (r13 review). A key at 0 in EVERY run is genuine
        # (work lives outside executor CPU, e.g. d13's Python worker).
        spread[k] = spread_entry(cpus, k in PYTHON_WORKER_KEYS)

    def _rank_val(k):
        if spread[k]["infinite"]:
            return float("inf")
        return spread[k]["ratio"]

    ranked = sorted(
        (k for k in keys
         if spread[k]["ratio"] is not None or spread[k]["infinite"]),
        key=lambda k: -_rank_val(k))
    over15 = [k for k in ranked if _rank_val(k) > 1.15]
    summary = {
        "n_runs": N,
        "per_run_totals": [
            {"wall_s": round(sum(v["wall_s"] for v in m.values()), 1),
             "task_cpu_s": round(sum(v["task_cpu_s"] for v in m.values()), 1),
             "shuffle_mb": round(sum(v["shuffle_bytes"]
                                     for v in m.values()) / 1e6, 1)}
            for m in runs
        ],
        "n_keys_compared": len(keys),
        "worst_cpu_ratio": (spread[ranked[0]]["ratio"] if ranked else None),
        "worst_cpu_infinite": (spread[ranked[0]]["infinite"]
                               if ranked else False),
        "keys_over_15pct": {
            k: spread[k] for k in over15
        },
        "n_over_15pct_python_worker": sum(
            1 for k in over15 if k in PYTHON_WORKER_KEYS),
        "n_over_15pct_jvm": sum(
            1 for k in over15 if k not in PYTHON_WORKER_KEYS),
        "top10_ratio": {k: spread[k]["ratio"] for k in ranked[:10]},
    }
    art = os.path.join(HERE, "stress100_results", "cpu_soak.json")
    with open(art, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "keys_over_15pct"}), flush=True)


if __name__ == "__main__":
    main()
