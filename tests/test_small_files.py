"""Small-files resilience: a 512-fragment table must read correctly
AND cheaply.

At 100 TB the classic operational hazard is not big files but small
ones — a streaming sink or over-parallel writer leaves a table as
thousands of KB-sized fragments, and an engine that schedules one task
per file drowns in task overhead (and one that mis-packs produces
wrong results under partition-sensitive operators). Spark's file scan
packs splits by ``spark.sql.files.maxPartitionBytes`` (128 MB) +
``openCostInBytes`` (4 MB synthetic cost per file): 512 tiny files
must coalesce into a handful of scan partitions, not 512 tasks.

This pins two things the rest of the suite assumes silently:

- the session posture never degrades packing (someone tuning
  maxPartitionBytes/openCostInBytes down for a micro-benchmark would
  break every many-file table at once);
- query results are identical on the fragmented layout — extending
  the 7-part partition-determinism gate two orders of magnitude
  further into fragmentation, on real query shapes (events
  sessionization and the orders/lineitem join surface).
"""

from __future__ import annotations

import os
import shutil

import pytest

from canon import canon_rows
from conftest import SF_DIR

from nyc_taxi_data_engineering_project_spark import registry
from nyc_taxi_data_engineering_project_spark.catalog import table

registry.load_all()

N_FILES = 512


@pytest.fixture(scope="module")
def fragmented_sf(spark, tmp_path_factory):
    """sf0.001 clone with events and orders shattered into 512 files
    each (other tables symlinked — fragmentation is the only change)."""
    root = str(tmp_path_factory.mktemp("frag_sf"))
    for name in ("events", "orders"):
        (
            table(spark, SF_DIR, name)
            .repartition(N_FILES)
            .write.mode("overwrite")
            .parquet(os.path.join(root, f"{name}.parquet"))
        )
    for name in ("region", "nation", "customer", "supplier", "part",
                 "lineitem", "documents", "embeddings"):
        os.symlink(
            os.path.join(SF_DIR, f"{name}.parquet"),
            os.path.join(root, f"{name}.parquet"),
        )
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_fragmented_scan_packs_files(spark, fragmented_sf):
    df = spark.read.parquet(os.path.join(fragmented_sf, "events.parquet"))
    n_files = len([
        f for f in os.listdir(os.path.join(fragmented_sf, "events.parquet"))
        if f.endswith(".parquet")
    ])
    assert n_files >= N_FILES * 0.9  # the shatter actually happened
    parts = df.rdd.getNumPartitions()
    # 512 tiny files at 4 MB openCost / 128 MB maxPartitionBytes pack
    # into ~16 splits; anything near one-task-per-file means the
    # packing posture broke
    assert parts <= n_files / 8, (parts, n_files)


def test_fragmented_results_identical(spark, fragmented_sf):
    for key in ("c36_sessionize", "b8_groupby_day", "b9_topk",
                "flagship_daily_region_revenue"):
        base = canon_rows(registry.QUERIES[key](spark, SF_DIR).collect())
        frag = canon_rows(
            registry.QUERIES[key](spark, fragmented_sf).collect())
        assert frag == base, f"{key} diverged on the fragmented layout"
