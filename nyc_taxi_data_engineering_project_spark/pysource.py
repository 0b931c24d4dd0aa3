"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The engine-extension point the reference has no analog for: a
user-defined source that plugs into ``spark.read.format(...)`` with
real partition-parallel planning — each ``InputPartition`` is read by
whichever executor owns the task, so a custom source scales exactly
like a built-in one. The demo source below generates a deterministic
keyed corpus (id, a seeded md5 fingerprint, and a bucket column), which
makes it oracle-checkable: DuckDB reproduces the same rows from
``range()`` + ``md5()``.

The same three-class shape (DataSource → DataSourceReader →
InputPartition) is how a production deployment wraps an internal REST
catalog, a proprietary file format, or a feed API without leaving
Python; the reader emits plain tuples (Arrow-batched by the runner), so
throughput is bounded by the payload, not per-row Python dispatch.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class RangeDocsPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RangeDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))
        self.seed = options.get("seed", "42")

    def partitions(self):
        """Split [0, n) into contiguous slices — the planning step that
        makes the source parallel: one task per returned partition."""
        step = max(1, -(-self.n // self.parts))
        return [
            RangeDocsPartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: RangeDocsPartition):
        """Executor-side: yield this slice's rows only."""
        import hashlib

        for i in range(partition.start, partition.end):
            fp = hashlib.md5(f"{self.seed}:{i}".encode()).hexdigest()
            yield i, fp, int(fp[:2], 16)


class RangeDocsSource(DataSource):
    """``spark.read.format("rangedocs").option("n", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "rangedocs"

    def schema(self) -> str:
        return "id bigint, fp string, bucket int"

    def reader(self, schema) -> RangeDocsReader:
        return RangeDocsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom format on a session."""
    spark.dataSource.register(RangeDocsSource)


class RangeDocsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked incremental reader: each ``read(start)`` emits the
    next ``batch`` rows and advances the offset dict; ``readBetweenOffsets``
    replays a committed range deterministically (the replay contract that
    makes the source exactly-once under checkpoint recovery).

    Note: Spark's Python micro-batch runtime does not implement
    Trigger.AvailableNow (it falls back to single-batch execution), so a
    bounded run processes min(batch, n) rows — the registered query key
    sets batch = n; the incremental path (many micro-batches with a
    processingTime trigger) is exercised in tests/test_pysource.py."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.batch = int(options.get("batch", 100))
        self.seed = options.get("seed", "42")

    def _rows(self, lo: int, hi: int):
        import hashlib

        # a LIST's iterator, not a generator: the runtime's prefetch
        # cache shallow-copies the returned iterator between the driver
        # and the planner, and generators are neither copyable nor
        # picklable (list iterators are both)
        return iter([
            (i, hashlib.md5(f"{self.seed}:{i}".encode()).hexdigest())
            for i in range(lo, hi)
        ])

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.batch, self.n)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["pos"], end["pos"])


class RangeDocsStreamSource(DataSource):
    """``spark.readStream.format("rangedocs_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "rangedocs_stream"

    def schema(self) -> str:
        return "id bigint, fp string"

    def simpleStreamReader(self, schema) -> RangeDocsStreamReader:
        return RangeDocsStreamReader(self.options)


def register_stream(spark) -> None:
    """Idempotent registration of the streaming format on a session."""
    spark.dataSource.register(RangeDocsStreamSource)
