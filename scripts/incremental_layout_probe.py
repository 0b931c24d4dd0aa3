"""Incremental layout maintenance at stress scale (r9, verdict ask 1).

The unit test proves the mechanics (only the delta is written); this
probe prices the ECONOMICS at the K=100 corpus: a directory-source
orders fact gets a layout, then one "month" of new rows arrives as an
appended part file, and the maintenance build is timed against a
from-scratch rebuild of the merged source. The ratio is the claim: a
monthly append should cost O(month), not O(table).

Setup mirrors the reference's ingest pattern (python/ingest_data.py:
160-166 — month-at-a-time appends into one fact), using the
stress_tpch workdir's orders table split ~11:1 by o_orderdate.

Run: python scripts/incremental_layout_probe.py [workdir] → JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_engineering_project_spark import fx  # noqa: E402
from nyc_taxi_data_engineering_project_spark.catalog import (  # noqa: E402
    build_workload_layout,
    drop_workload_layout,
    table,
)
from nyc_taxi_data_engineering_project_spark.session import get_session  # noqa: E402

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_tpch100"
SRC = os.path.join(WORK, "_inc_probe_src")
LAY = os.path.join(WORK, "_inc_probe_layout")


def main() -> None:
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{WORK}/orders.parquet")
    cutoff = orders.selectExpr(
        "percentile(to_unix_timestamp(o_orderdate), 0.92D) AS c"
    ).first()["c"]
    ts = F.to_unix_timestamp("o_orderdate")
    head = orders.filter(ts < cutoff)
    month = orders.filter(ts >= cutoff)

    shutil.rmtree(SRC, ignore_errors=True)
    shutil.rmtree(LAY, ignore_errors=True)
    os.makedirs(SRC)
    # lineitem must exist for the family build; single file copy/link
    os.symlink(f"{WORK}/lineitem.parquet", f"{SRC}/lineitem.parquet")
    head.write.parquet(f"{SRC}/orders.parquet")
    n_head = spark.read.parquet(f"{SRC}/orders.parquet").count()

    out = {"workdir": WORK, "rows_head": n_head}

    t0 = time.time()
    built = build_workload_layout(spark, SRC, LAY, tables=("orders",))
    out["initial_build_s"] = round(time.time() - t0, 2)

    # one month arrives as ONE new part file in the source dir
    tmp = os.path.join(WORK, "_inc_probe_month")
    month.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    shutil.copy(os.path.join(tmp, part),
                os.path.join(SRC, "orders.parquet", f"month-{part}"))
    out["rows_month"] = month.count()

    t0 = time.time()
    build_workload_layout(spark, SRC, LAY, tables=("orders",))
    out["incremental_s"] = round(time.time() - t0, 2)

    # digest of the served layout == digest of the plain merged source
    served = table(spark, SRC, "orders")
    d_layout = fx.hashed_result_digest(served)
    spark.conf.set("spark.spark_graft.layout_serve", "false")
    try:
        d_plain = fx.hashed_result_digest(table(spark, SRC, "orders"))
    finally:
        spark.conf.unset("spark.spark_graft.layout_serve")
    out["digest_equal"] = d_layout == d_plain
    out["rows_served"] = d_layout[0]

    # compaction: merge the append run back to one file per bucket
    # (the B-tree merge step), digest re-verified after the swap
    from nyc_taxi_data_engineering_project_spark.catalog import (
        compact_workload_layout,
    )

    t0 = time.time()
    files_before, files_after = compact_workload_layout(
        spark, SRC, LAY, tables=("orders",))["orders"]
    out["compact_s"] = round(time.time() - t0, 2)
    out["files_before_compact"] = files_before
    out["files_after_compact"] = files_after
    d_compacted = fx.hashed_result_digest(table(spark, SRC, "orders"))
    out["digest_equal_after_compact"] = d_compacted == d_plain

    # from-scratch rebuild of the SAME merged source, same bucket count
    t0 = time.time()
    build_workload_layout(spark, SRC, LAY, tables=("orders",),
                          rebuild=True)
    out["full_rebuild_s"] = round(time.time() - t0, 2)
    out["ratio_full_over_incremental"] = round(
        out["full_rebuild_s"] / max(out["incremental_s"], 0.01), 1)

    drop_workload_layout(spark, SRC)
    shutil.rmtree(SRC, ignore_errors=True)
    shutil.rmtree(LAY, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
