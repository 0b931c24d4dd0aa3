"""The ONE cell canonicalizer for Spark-vs-DuckDB value comparison.

Shared by the contract drive (scripts/drive_contract.py) and the pytest
comparator (tests/conftest.py) so the two gates can never silently
disagree about what counts as a match — they previously carried
hand-synchronized copies, and the r6 None/NaN-unification edit had to
land in both in lockstep (ADVICE r6).

Policy: None and float-NaN unify (pandas conflates null/NaN for float
columns, and a nullable INTEGER column round-trips as None from one
engine and NaN from the other — the distinction is unrecoverable at
this layer); floats collapse ulp-level cross-engine noise at 6 dp;
lists canonicalize element-wise; everything else compares as str.
"""

from __future__ import annotations

import math


def canon(v):
    if v is None:
        return "__null__"
    if isinstance(v, float):
        return "__null__" if math.isnan(v) else round(v, 6)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return str(v)


def canon_rows(rows):
    """Order-insensitive row multiset: the ONE row-level form too (the
    cell canonicalizer alone left three hand-synced copies of the
    sorted-tuples idiom across the gates). ``rows`` is any iterable of
    sequence-like rows (pandas itertuples, Spark Row objects)."""
    return sorted(
        (tuple(canon(v) for v in row) for row in rows), key=repr
    )
