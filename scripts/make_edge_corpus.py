"""Adversarial testdata generator for the oracle-differential gate.

The driver's correctness gate (and SWEEPS_r0x) runs every oracle-paired
key on CLEAN synthetic data — no nulls, no duplicate keys, no hostile
strings. Each engine pair (Spark, DuckDB) has its own opinions about
exactly the inputs that data never produces: null join keys, null
ordering inside window frames, empty strings vs nulls, division edges,
orphan foreign keys. This script writes a small corpus (same tables,
same parquet footer types as TESTDATA_TYPES.json — verified at the end)
where every nullable column HAS nulls, every key column HAS duplicates
and orphans, and strings include empty/unicode/whitespace — then
`scripts/drive_contract.py <dir>` becomes an adversarial differential:
keys where the two engines disagree are real semantic seams, not data
bugs.

Deterministic (seed fixed); ~2.9k rows total so a full 138-key drive
stays in minutes. Usage: python scripts/make_edge_corpus.py [outdir]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/edge_sf"
R = random.Random(7)

SEGS = ["BUILDING", "AUTOMOBILE", None, "", "家具—ügly"]
LANGS = ["en", "de", "fr", "xx", None]
FLAGS = ["A", "N", "R", None]
STATUS = ["O", "F", None, ""]
PRIO = ["1-URGENT", "5-LOW", None, ""]
ETYPES = ["click", "view", "purchase", None, "", "клик"]


def _ts(y, m, d, h=0, mi=0, s=0, us=0):
    return dt.datetime(y, m, d, h, mi, s, us)


def write(name, cols, schema):
    t = pa.table(cols, schema=pa.schema(schema))
    pq.write_table(t, os.path.join(OUT, f"{name}.parquet"),
                   version="2.6", coerce_timestamps=None,
                   store_schema=False)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    write("region", {
        "r_regionkey": pa.array([0, 1, 2, 3, 4], pa.int32()),
        "r_name": ["ASIA", "", "AMÉRIQUE—南米", None, "  padded  "],
    }, [("r_regionkey", pa.int32()), ("r_name", pa.string())])

    n = 25
    write("nation", {
        "n_nationkey": pa.array(list(range(n)), pa.int32()),
        "n_name": [None if i == 3 else ("" if i == 4 else f"NATION{i}")
                   for i in range(n)],
        # orphan regionkey 9 and a null: joins must drop identically
        "n_regionkey": pa.array(
            [None if i == 5 else (9 if i == 6 else i % 5) for i in range(n)],
            pa.int32()),
    }, [("n_nationkey", pa.int32()), ("n_name", pa.string()),
        ("n_regionkey", pa.int32())])

    nc = 200
    write("customer", {
        # duplicate key 7 (two rows), ids otherwise 0..198
        "c_custkey": pa.array([7 if i == 199 else i for i in range(nc)],
                              pa.int64()),
        # ü, not ß: upper() must stay in the corpus, but ß→SS is a
        # LOCALE special case Java applies and utf8proc (DuckDB) does
        # not — an inherent engine seam documented in SWEEPS_r06.md,
        # not a parity bug this corpus should keep re-reporting.
        # One-to-one mappings (ü→Ü) agree everywhere.
        "c_name": [None if i % 37 == 0 else ("" if i % 23 == 0
                   else f"cust-{i}-ü") for i in range(nc)],
        "c_nationkey": pa.array(
            [None if i % 41 == 0 else (99 if i % 43 == 0 else i % 25)
             for i in range(nc)], pa.int32()),
        "c_acctbal": pa.array(
            [None if i % 29 == 0 else round(R.uniform(-999, 9999), 2)
             for i in range(nc)], pa.float64()),
        "c_mktsegment": [SEGS[i % len(SEGS)] for i in range(nc)],
    }, [("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string())])

    ns = 50
    write("supplier", {
        "s_suppkey": pa.array(list(range(ns)), pa.int64()),
        "s_name": [None if i % 17 == 0 else f"supp{i}" for i in range(ns)],
        "s_nationkey": pa.array(
            [None if i % 19 == 0 else i % 25 for i in range(ns)], pa.int32()),
        "s_acctbal": pa.array(
            [None if i % 13 == 0 else round(R.uniform(-500, 5000), 2)
             for i in range(ns)], pa.float64()),
    }, [("s_suppkey", pa.int64()), ("s_name", pa.string()),
        ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())])

    npart = 100
    write("part", {
        "p_partkey": pa.array(list(range(npart)), pa.int64()),
        "p_name": [None if i % 31 == 0 else f"part {i} グリーン"
                   for i in range(npart)],
        "p_brand": [f"Brand#{i % 5}" if i % 11 else "" for i in range(npart)],
        "p_type": [None if i % 27 == 0 else
                   ["ECONOMY", "STANDARD BRASS", "", "PROMO#"][i % 4]
                   for i in range(npart)],
        "p_size": pa.array(
            [None if i % 21 == 0 else (0 if i % 22 == 0 else i % 50)
             for i in range(npart)], pa.int32()),
        "p_retailprice": pa.array(
            [None if i % 15 == 0 else round(R.uniform(0, 2000), 2)
             for i in range(npart)], pa.float64()),
    }, [("p_partkey", pa.int64()), ("p_name", pa.string()),
        ("p_brand", pa.string()), ("p_type", pa.string()),
        ("p_size", pa.int32()), ("p_retailprice", pa.float64())])

    no = 500
    odates = [
        None if i % 33 == 0 else
        _ts(1900, 1, 1) if i % 34 == 0 else
        _ts(2099, 12, 31, 23, 59, 59, 999999) if i % 35 == 0 else
        _ts(2024, 1 + i % 12, 1 + i % 28, i % 24, i % 60, 0, (i * 137) % 1000000)
        for i in range(no)
    ]
    write("orders", {
        "o_orderkey": pa.array([11 if i == 499 else i for i in range(no)],
                               pa.int64()),  # dup key 11
        "o_custkey": pa.array(
            [None if i % 39 == 0 else (9999 if i % 38 == 0 else i % 200)
             for i in range(no)], pa.int64()),
        "o_orderstatus": [STATUS[i % len(STATUS)] for i in range(no)],
        "o_totalprice": pa.array(
            [None if i % 26 == 0 else round(R.uniform(-100, 400000), 2)
             for i in range(no)], pa.float64()),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": [PRIO[i % len(PRIO)] for i in range(no)],
    }, [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")),
        ("o_orderpriority", pa.string())])

    nl = 2000
    sdates = [
        None if i % 43 == 0 else
        _ts(2024, 1 + (i // 7) % 12, 1 + i % 28, i % 24, (i * 7) % 60)
        for i in range(nl)
    ]
    write("lineitem", {
        "l_orderkey": pa.array(
            [None if i % 97 == 0 else (777777 if i % 89 == 0 else i % 500)
             for i in range(nl)], pa.int64()),  # nulls + orphans
        "l_partkey": pa.array([None if i % 61 == 0 else i % 100
                               for i in range(nl)], pa.int64()),
        "l_suppkey": pa.array([None if i % 59 == 0 else i % 50
                               for i in range(nl)], pa.int64()),
        "l_linenumber": pa.array([i % 7 for i in range(nl)], pa.int32()),
        "l_quantity": pa.array(
            [None if i % 53 == 0 else float(i % 50) for i in range(nl)],
            pa.float64()),
        "l_extendedprice": pa.array(
            [None if i % 47 == 0 else round(R.uniform(0, 90000), 2)
             for i in range(nl)], pa.float64()),
        "l_discount": pa.array(
            [None if i % 51 == 0 else [0.0, 0.05, 0.1, 1.0][i % 4]
             for i in range(nl)], pa.float64()),
        "l_tax": pa.array(
            [None if i % 49 == 0 else [0.0, 0.04, -0.02][i % 3]
             for i in range(nl)], pa.float64()),
        "l_returnflag": [FLAGS[i % len(FLAGS)] for i in range(nl)],
        "l_linestatus": [["O", "F", "", None][i % 4] for i in range(nl)],
        "l_shipdate": pa.array(sdates, pa.timestamp("us")),
    }, [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us"))])

    ne = 1000
    # event-time: monotone-ish but with NULLs sprinkled; two users are
    # hot; props mixes valid JSON, malformed JSON, empty, null
    props = ['{"a": 1}', '{"a": null, "b": [1,2]}', "not json", "", None,
             '{"nested": {"x": "ü"}}']
    write("events", {
        "event_id": pa.array(list(range(ne)), pa.int64()),
        "ts": pa.array(
            [None if i % 71 == 0 else
             _ts(2024, 3, 1 + (i // 96) % 28, (i // 4) % 24, i % 60,
                 (i * 3) % 60, (i * 1009) % 1000000)
             for i in range(ne)], pa.timestamp("us")),
        "user_id": pa.array(
            [None if i % 67 == 0 else (5 if i % 3 == 0 else i % 40)
             for i in range(ne)], pa.int64()),
        "event_type": [ETYPES[i % len(ETYPES)] for i in range(ne)],
        # IEEE specials in the metric double (r6 third wave): sensor
        # glitches and upstream 0/0 land NaN/±Inf in real event streams;
        # -0.0 probes sign-normalization in grouping/compare paths
        "value": pa.array(
            [float("nan") if i == 41 else
             float("inf") if i == 83 else
             float("-inf") if i == 167 else
             -0.0 if i == 251 else
             None if i % 37 == 0 else round(R.uniform(-10, 100), 3)
             for i in range(ne)], pa.float64()),
        "props": [props[i % len(props)] for i in range(ne)],
    }, [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())])

    nd = 120
    texts = []
    for i in range(nd):
        if i % 29 == 0:
            texts.append(None)
        elif i % 23 == 0:
            texts.append("")
        elif i % 19 == 0:
            texts.append("   ")  # whitespace-only
        elif i % 17 == 0:
            texts.append("one")
        elif i in (40, 41):
            texts.append("exact duplicate text body for dedup checks")
        else:
            words = [f"w{(i * 31 + j * 7) % 59}" for j in range(12 + i % 30)]
            if i % 5 == 0:
                words.insert(0, "émoji–☃")
            texts.append(" ".join(words))
    write("documents", {
        "doc_id": pa.array(list(range(nd)), pa.int64()),
        "text": texts,
        "lang": [LANGS[i % len(LANGS)] for i in range(nd)],
        "source": [None if i % 13 == 0 else ["web", "книга", ""][i % 3]
                   for i in range(nd)],
        "n_chars": pa.array(
            [None if i % 43 == 0 else (len(t) if t else 0)
             for i, t in enumerate(texts)], pa.int64()),
    }, [("doc_id", pa.int64()), ("text", pa.string()),
        ("lang", pa.string()), ("source", pa.string()),
        ("n_chars", pa.int64())])

    nv = 80
    embs = []
    for i in range(nv):
        if i % 37 == 0:
            embs.append(None)  # null vector
        else:
            embs.append([round(R.uniform(-1, 1), 4) for _ in range(64)])
    # two exact-duplicate vectors for near-dup checks
    embs[10] = embs[11] = [0.25] * 64
    # a NaN element (failed encoder writes garbage, not always null),
    # an all-zero vector (norm 0 → cosine 0/0), and a null ELEMENT
    # (parquet list<float> permits it; DuckDB's list_sum would silently
    # skip it where Spark's fold nulls out — both sides must exclude):
    # all must be as harmless as a null vector to every consumer
    embs[13] = [float("nan")] + [0.5] * 63
    embs[17] = [0.0] * 64
    embs[19] = [0.5] * 63 + [None]
    write("embeddings", {
        "vec_id": pa.array(list(range(nv)), pa.int64()),
        "embedding": pa.array(embs, pa.list_(pa.float32())),
        "label": pa.array([None if i % 31 == 0 else i % 8
                           for i in range(nv)], pa.int32()),
    }, [("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.field("element", pa.float32()))),
        ("label", pa.int32())])

    # footer-type parity with the committed contract — the whole point
    # is that ONLY the data is hostile, never the schema
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check_testdata_types import check

    diffs = check((OUT,))
    if diffs:
        print("TYPE MISMATCH vs TESTDATA_TYPES.json:")
        for d in diffs:
            print(" ", d)
        sys.exit(1)
    sizes = {t: pq.read_metadata(os.path.join(OUT, f"{t}.parquet")).num_rows
             for t in json.load(open(os.path.join(
                 os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "TESTDATA_TYPES.json")))}
    print(f"edge corpus at {OUT}: {sizes}")


if __name__ == "__main__":
    main()
