"""Query modules — importing this package registers every query key."""

from . import (  # noqa: F401
    etl, relational, advanced, funcs, streaming_q, udfs_q, llm, tpch,
)

__all_modules__ = (
    etl, relational, advanced, funcs, streaming_q, udfs_q, llm, tpch,
)
