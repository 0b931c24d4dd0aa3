"""Query modules — importing this package registers every query key."""

from . import etl, relational, advanced, funcs, streaming_q, udfs_q, llm  # noqa: F401

__all_modules__ = (etl, relational, advanced, funcs, streaming_q, udfs_q, llm)
