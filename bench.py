"""Benchmark harness — wall-clock per query key over the driver testdata.

Runs every registered query key (SURVEY.md §2 inventory) at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "total_query_wall_clock", "value": N, "unit": "sec",
     "queries": {"<key>": sec, ...}, "sf": 0.1}

Timing methodology: each query's DataFrame is materialized with a
``count()``-free full-evaluation action (``write.format("noop")``) so the
measured cost is plan + shuffle + compute — not driver collection or disk.
A single warm-up pass of the flagship query absorbs JVM/codegen startup.
Each key is then measured REPS (2) times — cache cleared between
repetitions so every rep is cold — and the MINIMUM is reported: in a
single shared JVM, per-run noise (GC pauses, Janino compiles, Python
worker spawns) is strictly additive, so min-of-N estimates the true
steady-state cost (the standard JMH/hyperfine posture). Round-1 runs
measured single-shot and the same keys swung 4-10× between runs purely
by which of them absorbed the pauses.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nyc_taxi_data_engineering_project_spark import registry  # noqa: E402
from nyc_taxi_data_engineering_project_spark.session import get_session  # noqa: E402
from nyc_taxi_data_engineering_project_spark.envguard import scrub_contract_env

scrub_contract_env()  # default-contract run: drop leaked overrides (r10 ADVICE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _materialize(df) -> None:
    # noop sink evaluates every row/column without driver collect or I/O
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    registry.load_all()
    spark = get_session("bench")

    # Opt-in A15 workload layout (catalog.build_workload_layout): with
    # SPARK_GRAFT_LAYOUT_DIR set, the full four-table layout (orderkey-
    # bucketed facts + doc_id-bucketed documents + LSH-partitioned
    # embeddings, r9) is built there once (timed separately below —
    # it's amortized capital, not per-query cost) and served
    # transparently to every layout-class key. Off by default so the
    # headline board stays comparable across rounds; run both ways to
    # price the layout at any SF.
    layout_dir = os.environ.get("SPARK_GRAFT_LAYOUT_DIR")
    layout_build_s = None
    if layout_dir:
        from nyc_taxi_data_engineering_project_spark.catalog import (
            LAYOUT_BUCKET_KEYS,
            build_workload_layout,
        )

        t0 = time.perf_counter()
        build_workload_layout(spark, SF_DIR, layout_dir,
                              tables=tuple(LAYOUT_BUCKET_KEYS))
        layout_build_s = round(time.perf_counter() - t0, 3)

    # warm-up: JVM, codegen, parquet footer caches — failure here must not
    # suppress the whole benchmark (each key also times its own first run)
    try:
        _materialize(
            registry.QUERIES["flagship_daily_region_revenue"](spark, SF_DIR)
        )
    except Exception as exc:
        print(f"# BENCH WARMUP ERROR: {exc}", file=sys.stderr)

    REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    for key in sorted(registry.QUERIES):
        fn = registry.QUERIES[key]
        best = -1.0
        for _ in range(REPS):
            t0 = time.perf_counter()
            try:
                _materialize(fn(spark, SF_DIR))
                t = round(time.perf_counter() - t0, 3)
                best = t if best < 0 else min(best, t)
            except Exception as exc:  # a failing key must not hide others
                print(f"# BENCH ERROR {key}: {exc}", file=sys.stderr)
                break
            # clear between reps as well as keys: rep 2 must re-run the
            # whole plan cold, not read rep 1's pinned frames
            spark.catalog.clearCache()
        timings[key] = best

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = _sf_of(SF_DIR)

    # Full per-key detail → repo file (the driver's stdout tail capture is
    # ~2 KB; a 104-key JSON line is ~2.7 KB and gets decapitated, r01).
    detail = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
    }
    if layout_build_s is not None:
        detail["layout_dir"] = layout_dir
        detail["layout_build_s"] = layout_build_s
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError as exc:
        print(f"# BENCH DETAIL WRITE ERROR: {exc}", file=sys.stderr)

    # Final stdout line (r11, verdict ask 6): the driver's stdout tail
    # capture decapitated a 142-key line two rounds running (73/142
    # parsed), so BENCH_DETAIL.json is the DECLARED per-key source of
    # truth and the stdout line stays compact — total + flagship + the
    # 12 slowest keys (~700 B, far inside any tail window). Printed
    # LAST so the tail always catches it whole.
    print(f"# full per-key board ({len(timings)} keys): {detail_path}",
          flush=True)
    slowest = sorted(timings, key=lambda k: -timings[k])[:12]
    out = {k: timings[k] for k in
           ["flagship_daily_region_revenue", *slowest] if k in timings}
    print(json.dumps(
        {"metric": "total_query_wall_clock", "value": total,
         "unit": "sec", "queries": out, "sf": sf,
         "n_queries": len(timings), "queries_shown": len(out),
         "detail": "BENCH_DETAIL.json"},
        separators=(",", ":"),
    ))
    spark.stop()


if __name__ == "__main__":
    main()
