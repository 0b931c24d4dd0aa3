"""Zero-row corpus: every table's EXACT schema (cloned from real
driver testdata, so the footer-type drift gate passes), no rows.

The at-scale edge this probes is routine, not exotic: a date-partitioned
100 TB table has empty partitions, a filter can select an empty month,
a backfill job starts from nothing. Every operator must return its
correct empty/zero answer — global aggregates their count-0 row,
windows and iterative loops nothing, samplers and index builds a clean
empty result — never a driver-side crash (an empty numpy sample, a
collect()[0] on no rows, a log(0)).

Usage: python scripts/make_empty_corpus.py [out_dir] [src_sf_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/empty_sf"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in TABLES:
        schema = pq.read_schema(os.path.join(SRC, f"{name}.parquet"))
        empty = pa.table(
            {f.name: pa.array([], f.type) for f in schema}, schema=schema
        )
        # same writer settings as make_edge_corpus.py: footer logical
        # types must be byte-for-byte what the drift gate expects
        pq.write_table(empty, os.path.join(OUT, f"{name}.parquet"),
                       version="2.6", coerce_timestamps=None,
                       store_schema=False)
    print(f"empty corpus at {OUT}: 10 tables, 0 rows each")


if __name__ == "__main__":
    main()
