"""Quantify the pin-mode trade (SCALE.md §7): run the pin-heavy keys
(f2 shingle/band pins, f14 loop pins, f13 double pin) under each
`spark.spark_graft.pin_mode` at sf0.1, assert identical results, and
time each mode. localCheckpoint is the single-node floor; disk_persist
and checkpoint_table are the executor-loss-tolerant cluster postures —
this records what that durability costs per key.

Run: python scripts/pin_mode_probe.py [sf_dir]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from nyc_taxi_data_engineering_project_spark import pinning, registry  # noqa: E402
from nyc_taxi_data_engineering_project_spark.session import get_session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KEYS = ("f2_minhash_dedup", "f13_embedding_neardup", "f14_dedup_clusters")
REPS = int(os.environ.get("REPS", "2"))


def main() -> None:
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    spark.conf.set("spark.spark_graft.pin_dir", "/tmp/pin_probe_tables")

    base: dict[str, list] = {}
    out: dict[str, dict] = {}
    for mode in pinning.MODES:
        spark.conf.set("spark.spark_graft.pin_mode", mode)
        for key in KEYS:
            secs = []
            rows = None
            for _ in range(REPS):
                t0 = time.time()
                rows = sorted(map(tuple,
                                  registry.QUERIES[key](spark, SF).collect()))
                secs.append(round(time.time() - t0, 2))
                pinning.release_pins(spark)
            if mode == "localCheckpoint":
                base[key] = rows
            else:
                assert rows == base[key], f"{key} diverged under {mode}"
            out.setdefault(key, {})[mode] = min(secs)
    jspark = spark._jsparkSession
    assert jspark.sharedState().cacheManager().isEmpty(), \
        "pins leaked into the session cache"
    print(json.dumps({"sf": SF, "reps": REPS, "secs": out,
                      "identical_results": True, "cache_clean": True}))


if __name__ == "__main__":
    main()
