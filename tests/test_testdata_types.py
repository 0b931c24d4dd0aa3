"""Pytest face of the footer-type drift gate (r5 verdict ask 2): the
contract drive (scripts/drive_contract.py) refuses to run on drift;
this makes plain ``pytest tests/`` catch the same incident class — a
driver-provided parquet file silently changing a logical type between
rounds (the r3 ``events.ts`` nanos->micros flip)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)

from check_testdata_types import check  # noqa: E402


def test_testdata_footer_types_match_contract():
    diffs = check()
    assert not diffs, (
        "driver testdata parquet types drifted from TESTDATA_TYPES.json — "
        "re-generate the contract, re-stamp TESTDATA.md, and audit "
        "catalog.nanos_ts_columns callers:\n" + "\n".join(diffs)
    )
