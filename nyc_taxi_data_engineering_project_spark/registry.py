"""Query-key registry.

Binds each operator of SURVEY.md §2 to (a) a DataFrame implementation
``(spark, sf_dir) -> DataFrame`` and (b) an optional ANSI-SQL oracle string
for the DuckDB differential check (SURVEY.md §5.2.1). ``__spark_entry__.py``
exposes the two dicts to the driver verbatim.

Keeping the oracle adjacent to the implementation (one ``@query`` call) is
what keeps column aliases in lockstep — the driver's value-hash sorts
columns by name, so every computed column must carry the same alias on
both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``key``; ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from .queries import __all_modules__  # noqa: F401
