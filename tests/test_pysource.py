"""Custom Python DataSource (pysource.py): batch partition parallelism
and streaming offset bookkeeping across real micro-batches."""

from __future__ import annotations

import time

from nyc_taxi_data_engineering_project_spark.pysource import (
    register,
    register_stream,
)


def test_batch_source_partition_parallel(spark):
    register(spark)
    df = (
        spark.read.format("rangedocs")
        .option("n", 1000).option("partitions", 8).load()
    )
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 1000
    assert len({r.id for r in rows}) == 1000  # no overlap between slices
    assert all(0 <= r.bucket <= 255 for r in rows)


def test_stream_source_advances_offsets_across_microbatches(spark, tmp_path):
    """batch=40 over n=200 must take ≥5 micro-batches; the memory sink
    accumulates exactly the full range with no dupes or gaps — the
    offset bookkeeping (initialOffset/read/readBetweenOffsets) is what
    is under test."""
    register_stream(spark)
    sdf = (
        spark.readStream.format("rangedocs_stream")
        .option("n", 200).option("batch", 40).load()
    )
    q = (
        sdf.writeStream.format("memory").queryName("pysrc_inc")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("pysrc_inc").count() >= 200:
                break
            time.sleep(0.5)
        ids = [r.id for r in spark.table("pysrc_inc").collect()]
        assert sorted(ids) == list(range(200))  # complete, no dupes
        n_batches = len(q.recentProgress)
        assert n_batches >= 5, f"expected >=5 micro-batches, saw {n_batches}"
    finally:
        q.stop()
