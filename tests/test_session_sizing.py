"""Input-bytes-derived initial shuffle-partition heuristic
(session.shuffle_partitions_for) — the SCALE.md §13b sizing rule as
engine code instead of harness-side arithmetic."""

from __future__ import annotations

import os

from nyc_taxi_data_engineering_project_spark.session import (
    _TARGET_PARTITION_BYTES, shuffle_partitions_for,
)


def test_core_count_floor_at_small_inputs():
    # sf0.1 tier (~17 MB) stays at the core-count floor
    assert shuffle_partitions_for(17_500_000, cpus=32) == 32
    assert shuffle_partitions_for(0, cpus=8) == 8


def test_scales_with_input_bytes():
    # the K=1000 shape: ~11 GB of parquet needs ~330 initial
    # partitions (the probe's empirically-required 320, SCALE.md §13b)
    n = shuffle_partitions_for(11_000_000_000, cpus=32)
    assert 300 <= n <= 360, n
    # exact contract: ceil(bytes / target), floored at cpus
    assert shuffle_partitions_for(_TARGET_PARTITION_BYTES * 100 + 1,
                                  cpus=4) == 101


def test_walks_directory_sizes(tmp_path):
    d = tmp_path / "data"
    (d / "t.parquet").mkdir(parents=True)
    (d / "t.parquet" / "part-0.parquet").write_bytes(
        b"x" * (2 * _TARGET_PARTITION_BYTES))
    (d / "t.parquet" / "part-1.parquet").write_bytes(
        b"x" * (3 * _TARGET_PARTITION_BYTES))
    # metadata/hidden files are not data
    (d / "t.parquet" / "_SUCCESS").write_bytes(b"x" * (10 << 20))
    (d / "t.parquet" / ".crc").write_bytes(b"x" * (10 << 20))
    assert shuffle_partitions_for(str(d), cpus=2) == 5
    assert os.path.isdir(str(d))
