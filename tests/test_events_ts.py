"""Events timestamp type robustness (the r3 incident regression gate).

The driver-provided ``events.parquet`` silently changed logical type
between rounds (TIMESTAMP(NANOS) → timestamp[us]), which broke every
code path that assumed one unit: the batch bigint-conversion guard went
dead and the stream schema kept applying a nanos→micros division to
values that were already micros (1000× time compression, VERDICT r3).

This test writes the SAME rows as a micros file and as a nanos file and
asserts the batch reader (``catalog.table``) and the stream reader
(``streaming.events_stream``) produce identical wall-clock timestamps
for both — so the next testdata regeneration cannot silently flip
semantics again."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_project_spark.catalog import (
    events_ts_is_nanos,
    table,
)
from nyc_taxi_data_engineering_project_spark.streaming import (
    events_stream,
    run_available_now,
)

_ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 7, 123456), 10, "click", 1.5, "{}"),
    (2, datetime.datetime(2024, 1, 1, 0, 29, 59, 999999), 10, "view", 2.5, "{}"),
    (3, datetime.datetime(2024, 3, 15, 12, 0, 0, 0), 11, "purchase", 3.5, "{}"),
]
_EXPECT = [
    "1|2024-01-01 00:00:07.123456",
    "2|2024-01-01 00:29:59.999999",
    "3|2024-03-15 12:00:00.000000",
]


def _write_events(tmpdir: str, unit: str, rows=None) -> str:
    sf_dir = os.path.join(tmpdir, unit)
    os.makedirs(sf_dir, exist_ok=True)
    cols = list(zip(*(rows if rows is not None else _ROWS)))
    t = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp(unit)),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(
        t, os.path.join(sf_dir, "events.parquet"),
        version="2.6", coerce_timestamps=None, store_schema=False,
    )
    return sf_dir


def _fmt(df):
    rows = df.select(
        F.concat_ws(
            "|",
            F.col("event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        ).alias("r")
    ).collect()
    return sorted(r.r for r in rows)


def test_events_is_one_file_per_sf():
    """The d2/d8/d10 oracles rest on the bounded replay being ONE
    micro-batch, which holds because events is a single parquet file
    (file source with no maxFilesPerTrigger → all files in one batch).
    If the driver ever splits events into a multi-file directory, this
    fails first with a readable message instead of three oracle
    mismatches."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/events.parquet"
        assert os.path.isfile(p), (
            f"{p} is not a single file — multi-batch replay would break "
            "the d2/d8/d10 single-batch oracle premise (see streaming_q)"
        )


def test_d2_watermark_boundary_premise():
    """d2's oracle exactness premise: the final watermark max(ts)-10min
    must NOT land exactly on an hour boundary, else the append-mode
    <=/< window-close seam becomes reachable and the batch twin could be
    off by one window. Data-dependent — so assert it against every SF's
    actual events file instead of trusting it (ADVICE r4)."""
    import pyarrow.compute as pc

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/events.parquet"
        ts = pq.read_table(p, columns=["ts"])["ts"]
        max_us = pc.max(ts).cast(pa.int64()).as_py()
        watermark_us = max_us - 10 * 60 * 1_000_000
        assert watermark_us % 3_600_000_000 != 0, (
            f"{p}: max(ts)-10min lands exactly on an hour boundary — "
            "the d2 oracle's window-close boundary is now reachable; "
            "re-derive the twin's <=/< semantics before trusting it"
        )


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_batch_read_ts_values(spark, tmp_path_factory, unit):
    sf_dir = _write_events(str(tmp_path_factory.mktemp("ev")), unit)
    assert events_ts_is_nanos(
        os.path.join(sf_dir, "events.parquet")
    ) == (unit == "ns")
    df = table(spark, sf_dir, "events")
    # both dispatch branches must yield the SAME column type (NTZ) so
    # type-sensitive downstream code can't behave differently per unit
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    assert _fmt(df) == _EXPECT


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_batch_read_any_table_nanos_columns(spark, tmp_path_factory, unit):
    """The footer dispatch is per-column and applies to EVERY table, not
    just events — a regenerated orders/lineitem with nanos dates would
    break ~40 keys the same way the events flip did."""
    sf_dir = str(tmp_path_factory.mktemp("ord"))
    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": pa.array(
                [datetime.datetime(2024, 5, 1, 8, 30, 0, 250000),
                 datetime.datetime(2024, 5, 2, 9, 0, 0, 0)],
                pa.timestamp(unit),
            ),
        }
    )
    pq.write_table(
        t, os.path.join(sf_dir, "orders.parquet"),
        version="2.6", coerce_timestamps=None, store_schema=False,
    )
    got = sorted(
        r.r for r in table(spark, sf_dir, "orders").select(
            F.concat_ws(
                "|", F.col("o_orderkey"),
                F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            ).alias("r")
        ).collect()
    )
    assert got == [
        "1|2024-05-01 08:30:00.250000",
        "2|2024-05-02 09:00:00.000000",
    ]


def test_footer_dispatch_cache_invalidation(tmp_path_factory):
    """The footer-type cache is keyed on (path, mtime): rewriting the
    same path with a different timestamp unit in-process must
    re-dispatch, not serve the stale unit (ADVICE r4 footgun)."""
    from nyc_taxi_data_engineering_project_spark.catalog import (
        nanos_ts_columns,
    )

    tmpdir = str(tmp_path_factory.mktemp("cacheinv"))
    sf_us = _write_events(tmpdir, "us")
    p = os.path.join(sf_us, "events.parquet")
    assert nanos_ts_columns(p) == ()
    # rewrite the SAME path as nanos with a strictly newer mtime
    cols = list(zip(*_ROWS))
    t = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("ns")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(t, p, version="2.6", coerce_timestamps=None,
                   store_schema=False)
    os.utime(p, ns=(os.stat(p).st_atime_ns, os.stat(p).st_mtime_ns + 1))
    assert nanos_ts_columns(p) == ("ts",)


def _events_arrow_table(unit: str):
    cols = list(zip(*_ROWS))
    return pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp(unit)),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )


def test_footer_dispatch_cache_same_mtime_tick(tmp_path_factory):
    """ADVICE r5: mtime granularity is filesystem-dependent — an
    in-process rewrite can land in the SAME tick on 1s-granularity
    filesystems, and the previous test only passed by manually bumping
    mtime. st_size is now the second cache-key discriminator: rewrite
    us→ns, force mtime back to the ORIGINAL value, and the dispatch
    must still flip."""
    from nyc_taxi_data_engineering_project_spark.catalog import (
        nanos_ts_columns,
    )

    tmpdir = str(tmp_path_factory.mktemp("sametick"))
    sf_us = _write_events(tmpdir, "us")
    p = os.path.join(sf_us, "events.parquet")
    st0 = os.stat(p)
    assert nanos_ts_columns(p) == ()
    pq.write_table(_events_arrow_table("ns"), p, version="2.6",
                   coerce_timestamps=None, store_schema=False)
    # simulate a coarse-mtime filesystem: identical mtime tick
    os.utime(p, ns=(st0.st_atime_ns, st0.st_mtime_ns))
    assert os.stat(p).st_size != st0.st_size, (
        "probe premise broken: us and ns encodings landed on the same "
        "byte size — vary _ROWS so the size discriminator is testable"
    )
    assert nanos_ts_columns(p) == ("ts",)


def test_footer_dispatch_dir_keyed_on_all_parts(tmp_path_factory):
    """ADVICE r5: directory dispatch used to cache on parts[0]'s
    identity only, so ADDING a part (or rewriting a non-first one)
    served a stale or unrepresentative answer. The key is now the full
    sorted part list; and because a mixed-unit directory cannot be
    represented by a single-unit dispatch, it is refused loudly instead
    of half-read."""
    from nyc_taxi_data_engineering_project_spark.catalog import (
        nanos_ts_columns,
    )

    d = str(tmp_path_factory.mktemp("dirparts") / "events.parquet")
    os.makedirs(d)
    pq.write_table(_events_arrow_table("us"), os.path.join(d, "part-0.parquet"),
                   version="2.6", coerce_timestamps=None, store_schema=False)
    assert nanos_ts_columns(d) == ()
    # append a nanos part WITHOUT touching part-0: the old parts[0]-keyed
    # cache would still answer () from the stale entry; the full-list key
    # re-dispatches and the first+last peek sees the unit conflict
    pq.write_table(_events_arrow_table("ns"), os.path.join(d, "part-1.parquet"),
                   version="2.6", coerce_timestamps=None, store_schema=False)
    with pytest.raises(ValueError, match="mixed TIMESTAMP units"):
        nanos_ts_columns(d)


def test_footer_dispatch_dir_refuses_interior_odd_part(tmp_path_factory):
    """ADVICE r6: the refusal used to peek only the FIRST and LAST
    sorted parts, so a differing unit in an interior part (partial
    compaction; lexicographic ordering interleaving two writers) passed
    the guard and was silently misread. Every part footer is peeked
    now: a nanos part-1 between micros part-0 and part-2 must refuse."""
    from nyc_taxi_data_engineering_project_spark.catalog import (
        nanos_ts_columns,
    )

    d = str(tmp_path_factory.mktemp("dirmid") / "events.parquet")
    os.makedirs(d)
    for i, unit in enumerate(["us", "ns", "us"]):
        pq.write_table(_events_arrow_table(unit),
                       os.path.join(d, f"part-{i}.parquet"), version="2.6",
                       coerce_timestamps=None, store_schema=False)
    with pytest.raises(ValueError, match="mixed TIMESTAMP units"):
        nanos_ts_columns(d)


def test_footer_dispatch_dir_refuses_unreadable_part(tmp_path_factory):
    """A directory with one corrupt/mid-write part footer must refuse
    loudly, not silently return 'no nanos columns' for the whole table
    (which would disable the dispatch AND the mixed-unit guard)."""
    from nyc_taxi_data_engineering_project_spark.catalog import (
        nanos_ts_columns,
    )

    d = str(tmp_path_factory.mktemp("dirbad") / "events.parquet")
    os.makedirs(d)
    pq.write_table(_events_arrow_table("ns"), os.path.join(d, "part-0.parquet"),
                   version="2.6", coerce_timestamps=None, store_schema=False)
    with open(os.path.join(d, "part-1.parquet"), "wb") as fh:
        fh.write(b"PAR1truncated-mid-write")
    with pytest.raises(ValueError, match="unreadable parquet footer"):
        nanos_ts_columns(d)


def test_footer_dispatch_mixed_error_blames_minority(tmp_path_factory):
    """The mixed-unit message must finger the stray part, not the
    majority — even when the stray sorts FIRST (computing 'odd' vs
    parts[0] would blame every good part)."""
    from nyc_taxi_data_engineering_project_spark.catalog import (
        nanos_ts_columns,
    )

    d = str(tmp_path_factory.mktemp("dirminor") / "events.parquet")
    os.makedirs(d)
    for i, unit in enumerate(["ns", "us", "us", "us"]):  # stray first
        pq.write_table(_events_arrow_table(unit),
                       os.path.join(d, f"part-{i}.parquet"), version="2.6",
                       coerce_timestamps=None, store_schema=False)
    with pytest.raises(ValueError, match=r"part-0.*1 minority"):
        nanos_ts_columns(d)


def test_footer_dispatch_dir_homogeneous_nanos(tmp_path_factory):
    from nyc_taxi_data_engineering_project_spark.catalog import (
        nanos_ts_columns,
    )

    d = str(tmp_path_factory.mktemp("dirns") / "events.parquet")
    os.makedirs(d)
    for i in range(2):
        pq.write_table(_events_arrow_table("ns"),
                       os.path.join(d, f"part-{i}.parquet"), version="2.6",
                       coerce_timestamps=None, store_schema=False)
    assert nanos_ts_columns(d) == ("ts",)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_stream_read_ts_values(spark, tmp_path_factory, unit):
    sf_dir = _write_events(str(tmp_path_factory.mktemp("ev")), unit)
    out = run_available_now(
        events_stream(spark, sf_dir).select("event_id", "ts"),
        f"ts_robust_{unit}",
    )
    assert _fmt(out) == _EXPECT


# Rows exercising the stateful-join and dedup seams: clicks followed by
# purchases inside/outside the 30-min interval, duplicate (user, type)
# pairs, and microsecond-precision timestamps whose values would shift
# visibly if the ns→us division were wrong by a factor anywhere.
_STATEFUL_ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 7, 123456), 10, "click", 1.0, "{}"),
    (2, datetime.datetime(2024, 1, 1, 0, 10, 0, 500000), 10, "purchase", 2.0, "{}"),
    (3, datetime.datetime(2024, 1, 1, 0, 50, 0, 0), 10, "purchase", 3.0, "{}"),
    (4, datetime.datetime(2024, 1, 1, 1, 0, 0, 1), 11, "click", 4.0, "{}"),
    (5, datetime.datetime(2024, 1, 1, 1, 29, 0, 999999), 11, "purchase", 5.0, "{}"),
    (6, datetime.datetime(2024, 1, 1, 1, 5, 0, 0), 11, "click", 6.0, "{}"),
    (7, datetime.datetime(2024, 1, 1, 2, 0, 0, 0), 12, "view", 7.0, "{}"),
    (8, datetime.datetime(2024, 1, 1, 2, 1, 0, 0), 12, "view", 8.0, "{}"),
]


def test_stream_stateful_ops_unit_equivalence(spark, tmp_path_factory):
    """The r3 incident fix is pinned for ts VALUES through the stream
    reader, but the stateful operators downstream (watermarked
    stream-stream interval join d11, dropDuplicatesWithinWatermark d12)
    consume the dispatched column for state eviction and range matching
    — drive both end-to-end over a nanos file and a micros file of the
    SAME rows and require identical outputs (VERDICT r4 ask 3)."""
    from nyc_taxi_data_engineering_project_spark.queries.streaming_q import (
        d11_stream_stream_join,
        d12_dedup_within_watermark,
    )

    tmpdir = str(tmp_path_factory.mktemp("evstate"))
    results = {}
    for unit in ("us", "ns"):
        sf_dir = _write_events(tmpdir, unit, rows=_STATEFUL_ROWS)
        join_rows = sorted(
            tuple(r) for r in d11_stream_stream_join(spark, sf_dir).collect()
        )
        dedup_rows = sorted(
            tuple(r) for r in d12_dedup_within_watermark(spark, sf_dir).collect()
        )
        results[unit] = (join_rows, dedup_rows)
    join_us, dedup_us = results["us"]
    join_ns, dedup_ns = results["ns"]
    # value-level ground truth, not just cross-unit agreement: the two
    # in-window click→purchase pairs, with second-boundary-crossing diffs
    assert join_us == [
        (1, 2, 10, 593),   # 00:00:07.123456 → 00:10:00.500000
        (4, 5, 11, 1740),  # 01:00:00.000001 → 01:29:00.999999
        (6, 5, 11, 1440),  # 01:05:00.000000 → 01:29:00.999999
    ]
    assert join_ns == join_us
    assert dedup_us == [
        (10, "click"), (10, "purchase"),
        (11, "click"), (11, "purchase"),
        (12, "view"),
    ]
    assert dedup_ns == dedup_us


def test_directory_layout_events(spark, tmp_path_factory):
    """events.parquet as a DIRECTORY of part files (any Spark-written
    copy) must stream every row — the r4 stress run exposed the leaf-name
    glob silently matching zero part files (streams ran instantly on
    empty input), so both readers now dispatch on the layout."""
    sf_dir = str(tmp_path_factory.mktemp("evdir"))
    d = os.path.join(sf_dir, "events.parquet")
    os.makedirs(d)
    cols = list(zip(*_ROWS))
    for i, sl in enumerate((slice(0, 2), slice(2, 3))):  # two part files
        t = pa.table(
            {
                "event_id": pa.array(cols[0][sl], pa.int64()),
                "ts": pa.array(cols[1][sl], pa.timestamp("us")),
                "user_id": pa.array(cols[2][sl], pa.int64()),
                "event_type": pa.array(cols[3][sl], pa.string()),
                "value": pa.array(cols[4][sl], pa.float64()),
                "props": pa.array(cols[5][sl], pa.string()),
            }
        )
        pq.write_table(t, os.path.join(d, f"part-{i}.parquet"),
                       version="2.6", store_schema=False)
    assert _fmt(table(spark, sf_dir, "events")) == _EXPECT
    out = run_available_now(
        events_stream(spark, sf_dir).select("event_id", "ts"), "ts_dir"
    )
    assert _fmt(out) == _EXPECT
