"""Footer-type drift gate (r5 verdict ask 2): the driver-provided
parquet testdata has silently changed logical types between rounds
before (`events.ts` TIMESTAMP(NANOS) -> timestamp[us] between r2 and
r3, breaking batch AND stream readers — VERDICT r3). The guard used to
be a manual "diff TESTDATA.md's table" ritual, which r5 forgot to
re-stamp; this makes it mechanical.

`TESTDATA_TYPES.json` (repo root) is the committed contract: per table,
per column, the pyarrow-rendered parquet logical type. `check()` reads
every table's footer at the given SF dirs and returns a list of
human-readable diffs — added/removed columns count as drift too, and a
table whose file is missing is reported rather than skipped.

Used by scripts/drive_contract.py (fails the drive loudly before any
query runs) and tests/test_testdata_types.py (fails pytest). On
intentional drift: re-generate the JSON, re-stamp TESTDATA.md's
footer-type section, and audit every reader that dispatches on the
moved type (catalog.nanos_ts_columns and its callers).

Usage: python scripts/check_testdata_types.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONTRACT = os.path.join(REPO, "TESTDATA_TYPES.json")
DEFAULT_SF_DIRS = tuple(
    f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")
)


def footer_types(sf_dir: str, tables) -> dict[str, dict[str, str] | None]:
    import pyarrow.parquet as pq

    out: dict[str, dict[str, str] | None] = {}
    for t in tables:
        path = os.path.join(sf_dir, f"{t}.parquet")
        try:
            schema = pq.read_schema(path)
        except Exception:
            out[t] = None  # missing/unreadable is drift, not a skip
            continue
        out[t] = {f.name: str(f.type) for f in schema}
    return out


def check(sf_dirs=DEFAULT_SF_DIRS) -> list[str]:
    """Diffs vs the committed contract; empty list == no drift."""
    with open(CONTRACT) as fh:
        want = json.load(fh)
    diffs: list[str] = []
    for sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            continue  # driver may provide a subset of SFs
        got = footer_types(sf_dir, want)
        for t, want_cols in want.items():
            got_cols = got[t]
            if got_cols is None:
                diffs.append(f"{sf_dir}/{t}.parquet: missing or unreadable")
                continue
            for c in sorted(set(want_cols) | set(got_cols)):
                w, g = want_cols.get(c), got_cols.get(c)
                if w != g:
                    diffs.append(
                        f"{sf_dir}/{t}.parquet column {c}: "
                        f"contract={w or 'ABSENT'} observed={g or 'ABSENT'}"
                    )
    return diffs


def main() -> None:
    sf_dirs = tuple(sys.argv[1:]) or DEFAULT_SF_DIRS
    diffs = check(sf_dirs)
    if diffs:
        print("TESTDATA FOOTER-TYPE DRIFT (vs TESTDATA_TYPES.json):")
        for d in diffs:
            print(f"  {d}")
        sys.exit(1)
    print(f"footer types match TESTDATA_TYPES.json for {len(sf_dirs)} dirs")


if __name__ == "__main__":
    main()
