"""Streaming layout maintenance at tier (r14, verdict ask 7): d14 is
measured at sf 0.1 only — this probe drives ``stream_append_layout``'s
mechanics over a K-replicated orders corpus as a 12-micro-batch stream
and records the per-batch cost curve and read fan-in.

The 100 TB claims under test:

- **per-batch cost is O(batch), flat in corpus size**: batch i appends
  into a layout already holding i·batch rows via the manifest diff —
  if the append ever re-reads the accumulated corpus, later batches
  trend upward. Gate: mean(last 3 batch costs) <= 1.5x mean(batches
  2..4) (batch 0 pays the initial build and is excluded).
- **read fan-in stays bounded under the auto-minor-compaction hook**:
  every append lands <= 1 new sorted run per touched bucket; once a
  table passes LAYOUT_COMPACT_RUNS_PER_BUCKET (4) average runs the
  maintenance path minor-compacts it under the same build lock — the
  per-batch runs/bucket series must saw-tooth under ~threshold + 1,
  not grow linearly with batch count.
- **exactly-once**: the served layout holds every streamed order
  exactly once (count == distinct == K x source).

Per-batch timing wraps the SAME writer ``stream_append_layout`` uses
(``catalog.layout_ingest_writer``) in a timing foreachBatch — the
mechanics (replay-guarded deterministic publication + manifest-diff
append + auto-compaction) are the production path, unmodified.

Run:  python scripts/stream_layout_scale_probe.py [K] [n_batches]
Artifact: merged into scripts/stress100_results/streaming_scale.json
as the "layout_stream_K{K}" row.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_engineering_project_spark import catalog  # noqa: E402
from nyc_taxi_data_engineering_project_spark.session import (  # noqa: E402
    driver_memory_for,
    get_session,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 12
WORK = "/tmp/stream_layout_scale"
SHIFT = 100_000_000


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    feed = os.path.join(WORK, "feed")
    src_dir = os.path.join(WORK, "src")
    lay = os.path.join(WORK, "layout")
    ckpt = os.path.join(WORK, "ckpt")

    if "SPARK_GRAFT_DRIVER_MEM" not in os.environ:
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = driver_memory_for(
            K * (2 << 20) * 2)  # orders ~2 MB/K unit, x2 (feed+layout)
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    n_src = orders.count()
    copies = (
        orders.withColumn(
            "_i", F.explode(F.sequence(F.lit(0), F.lit(K - 1))))
        .withColumn("o_orderkey",
                    F.col("o_orderkey") + F.col("_i").cast("long") * SHIFT)
        .withColumn("o_custkey",
                    F.col("o_custkey") + F.col("_i").cast("long") * SHIFT)
        .drop("_i")
    )
    copies.repartition(N_BATCHES).write.parquet(feed)
    total = n_src * K
    print(f"feed: {total} orders in {N_BATCHES} files -> {feed}",
          flush=True)

    os.makedirs(src_dir, exist_ok=True)
    inner = catalog.layout_ingest_writer(
        src_dir, lay, "orders", stream_id=os.path.abspath(ckpt),
        buckets=32)
    batch_log: list[dict] = []

    def timed_writer(batch_df, batch_id: int) -> None:
        t0 = time.time()
        inner(batch_df, batch_id)
        secs = round(time.time() - t0, 2)
        # post-batch layout geometry (driver-side metadata walk)
        s = batch_df.sparkSession
        tbl = s.conf.get(catalog._layout_conf_key(src_dir, "orders"))
        tbl_dir = os.path.join(lay, tbl)
        man = catalog._read_manifest(lay, tbl) or {}
        entry = {
            "batch_id": int(batch_id), "secs": secs,
            "rows": batch_df.count(),
            "layout_files": catalog._layout_n_files(tbl_dir),
            "runs_per_bucket": round(
                catalog._runs_per_bucket(lay, tbl, man), 2),
            "minor_compactions": int(man.get("minor_compactions", 0)),
            "compactions": int(man.get("compactions", 0)),
        }
        batch_log.append(entry)
        print(f"  batch {batch_id}: {entry}", flush=True)

    stream = (spark.readStream.schema(orders.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))
    t0 = time.time()
    q = (stream.writeStream.foreachBatch(timed_writer)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    drain_wall = round(time.time() - t0, 1)

    # serve through the layout in the caller's session and check
    # exactly-once at tier
    catalog.build_workload_layout(spark, src_dir, lay, buckets=32,
                                  tables=("orders",))
    served = catalog.table(spark, src_dir, "orders")
    n, nd = served.count(), served.select("o_orderkey").distinct().count()
    assert n == total == nd, (n, nd, total)

    # the flat-cost read needs distinct steady (post-warmup) and tail
    # windows; under ~6 batches they would overlap or be empty (r14
    # self-review: n_batches=3 divided by zero AFTER the full drain
    # was already paid) — report the curve without the verdict instead
    steady = [b["secs"] for b in batch_log if 2 <= b["batch_id"] <= 4]
    tail = [b["secs"] for b in batch_log if b["batch_id"]
            >= len(batch_log) - 3]
    flat = (
        (sum(tail) / len(tail)) <= 1.5 * (sum(steady) / len(steady))
        if steady and tail and len(batch_log) >= 6 else None
    )
    max_runs = max(b["runs_per_bucket"] for b in batch_log)
    fanin_bounded = max_runs <= catalog.LAYOUT_COMPACT_RUNS_PER_BUCKET + 1.5
    row = {
        "K": K, "n_batches": N_BATCHES, "rows": total,
        "drain_wall_s": drain_wall,
        "rows_per_s": int(total / drain_wall),
        "served_exactly_once": True,
        "per_batch": batch_log,
        "steady_mean_s": round(sum(steady) / len(steady), 2),
        "tail_mean_s": round(sum(tail) / len(tail), 2),
        "per_batch_flat": flat,
        "max_runs_per_bucket": max_runs,
        "fanin_bounded": fanin_bounded,
        "minor_compactions_total": batch_log[-1]["minor_compactions"],
    }
    assert flat is not False, row  # None = windows too short to judge
    assert fanin_bounded, row
    print(json.dumps({k: v for k, v in row.items() if k != "per_batch"}),
          flush=True)

    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "stress100_results", "streaming_scale.json")
    data = {}
    if os.path.exists(art):
        with open(art) as fh:
            data = json.load(fh)
    data[f"layout_stream_K{K}"] = row
    with open(art, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
        fh.write("\n")
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
