"""100x scale-up of the RELATIONAL core: all 22 TPC-H keys + the
flagship, on a referentially-consistent replica corpus, each
value-checked against DuckDB on the same parquet.

Why a separate harness from stress100.py: that workdir replicates only
the fact/LLM tables (orders/lineitem/events/documents/embeddings), so
replica i > 0 orders reference customers that do not exist — fine for
the skew probes it serves, but it breaks TPC-H referential integrity
(inner joins silently drop every replica and the "100x" run would
measure 1x of work). Here ALL keyed tables replicate with CONSISTENT
shifts — customer/supplier/part get the same +i*SHIFT their foreign
keys get in orders/lineitem — while nation/region stay fixed (the
realistic shape: dims that small stay small at any scale, and they are
the broadcast sides the plans rely on). Result at K=100 over sf0.1:
~60 M lineitem, ~15 M orders, ~1.5 M customer, ~2 M part, ~100 k
supplier — TPC-H at roughly SF 10.

Replication is ONE pass per table via explode(sequence(0, K-1)) — a
map-only plan, no K-way union.

Correctness at scale: every key's registered DuckDB oracle runs on the
SAME workdir parquet and the comparison classifies each key as
  exact    — canonicalized values identical (the drive_contract bar)
  quantum  — numeric columns differ by at most one rounding quantum of
             the key's fround'ed output (the documented residual
             float-sum class, fx.py: double accumulation order is
             engine-specific; at 60 M rows a sum near a .xx5 boundary
             can legitimately round apart)
  MISMATCH — anything else (a real bug)
Schema and row counts must always match exactly.

Run:  python scripts/stress_tpch.py [K] [workdir]
Emits one JSON line per key and a trailing summary for SCALE.md;
per_row_vs_sf01 = secs / (K * bench_detail_secs_at_sf0.1).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from canon import canon_rows  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_engineering_project_spark import catalog, registry  # noqa: E402
from nyc_taxi_data_engineering_project_spark.session import get_session  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_tpch100"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SHIFT = 100_000_000

# every keyed table shifts ALL its key columns (primary and foreign) by
# the same i*SHIFT, so joins hold within each replica; nation/region
# keys are NOT shifted anywhere, so the fixed dims serve all replicas.
_REKEY: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}
_FIXED = ["region", "nation"]

KEYS = ["flagship_daily_region_revenue"] + [f"tpch_q{i}" for i in
                                            range(1, 23)]
# comma-separated subset for long-haul probes (e.g. K=1000, where the
# full battery would take hours): SPARK_GRAFT_TPCH_KEYS=tpch_q1,tpch_q21
if os.environ.get("SPARK_GRAFT_TPCH_KEYS"):
    KEYS = [k for k in os.environ["SPARK_GRAFT_TPCH_KEYS"].split(",") if k]


def materialize(spark) -> None:
    t0 = time.time()
    os.makedirs(WORK, exist_ok=True)
    for name in _FIXED:
        shutil.copy(f"{SRC}/{name}.parquet", f"{WORK}/{name}.parquet")
    for name, keys in _REKEY.items():
        df = catalog.table(spark, SRC, name)
        df = df.withColumn(
            "_i", F.explode(F.sequence(F.lit(0), F.lit(K - 1)))
        )
        for kcol in keys:
            df = df.withColumn(kcol, F.col(kcol) + F.col("_i") * _SHIFT)
        df.drop("_i").write.mode("overwrite").parquet(
            f"{WORK}/{name}.parquet")
    print(f"materialized {K}x in {time.time()-t0:.0f}s -> {WORK}",
          flush=True)


def _quantum(col_vals_a, col_vals_b) -> float:
    """Max abs diff between two aligned numeric columns."""
    worst = 0.0
    for a, b in zip(col_vals_a, col_vals_b):
        if a is None or b is None:
            if a is not b:
                return math.inf
            continue
        try:
            d = abs(float(a) - float(b))
        except (TypeError, ValueError):
            return math.inf if a != b else worst
        if math.isnan(d):
            d = 0.0 if (math.isnan(float(a)) and math.isnan(float(b))) \
                else math.inf
        worst = max(worst, d)
    return worst


def compare(sdf, odf) -> tuple[str, str]:
    """-> (status, note); status in exact|quantum|MISMATCH."""
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return "MISMATCH", f"cols {scols} vs {ocols}"
    if len(sdf) != len(odf):
        return "MISMATCH", f"rowcount {len(sdf)} vs {len(odf)}"
    s = canon_rows(sdf[scols].itertuples(index=False))
    o = canon_rows(odf[scols].itertuples(index=False))
    if s == o:
        return "exact", ""
    # numeric-tolerance pass: sort both frames by the non-float columns
    # (keys/dates/counts — must match exactly), then bound per-column
    # numeric drift by one quantum of the coarsest fround in the repo
    # (r2 -> 0.01), scaled by 1+eps for the boundary-flip case.
    keycols = [c for c in scols
               if str(sdf[c].dtype) not in ("float64", "float32")]
    numcols = [c for c in scols if c not in keycols]
    if not numcols:
        return "MISMATCH", "non-numeric values differ"
    ss = sdf.sort_values(keycols or scols).reset_index(drop=True)
    oo = odf.sort_values(keycols or scols).reset_index(drop=True)
    for c in keycols:
        if list(ss[c]) != list(oo[c]):
            return "MISMATCH", f"key column {c} differs"
    worst = {c: _quantum(ss[c], oo[c]) for c in numcols}
    bad = {c: w for c, w in worst.items() if w > 0.01 * 1.0000001}
    if bad:
        return "MISMATCH", f"numeric drift beyond quantum: {bad}"
    return "quantum", (
        "float-sum rounding drift <= one r2 quantum in: "
        + ", ".join(f"{c}={w:.4g}" for c, w in worst.items() if w > 0))


def main() -> None:
    # SCALE.md §2/§13: shuffle partitions are sized to the input so a
    # partition fits executor memory — the session default (32, sized
    # for sf0.1 on local[32]) is ~19M rows/partition at K=1000, which
    # OOMs stage-level hash aggregates exactly as the sizing rule
    # predicts (observed: q21 heap OOM at K=1000 under the default).
    # Scale the initial count linearly with K and let AQE coalesce.
    n_shuffle = int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(32, (32 * K) // 100))))
    spark = get_session(
        extra_conf={"spark.sql.shuffle.partitions": str(n_shuffle)})
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    if not os.path.exists(f"{WORK}/lineitem.parquet"):
        materialize(spark)
    else:
        print(f"reusing {WORK}", flush=True)

    con = duckdb.connect()
    for name in list(_REKEY) + _FIXED:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{WORK}/{name}.parquet/*.parquet')"
            if os.path.isdir(f"{WORK}/{name}.parquet")
            else f"CREATE VIEW {name} AS SELECT * FROM "
                 f"read_parquet('{WORK}/{name}.parquet')"
        )

    bench = {}
    bd_path = os.path.join(REPO, "BENCH_DETAIL.json")
    if os.path.exists(bd_path):
        with open(bd_path) as fh:
            b = json.load(fh)
        bench = b.get("queries", b)

    results: dict[str, dict] = {}
    for key in KEYS:
        secs = []
        sdf = None
        try:
            for _ in range(int(os.environ.get("SPARK_GRAFT_TPCH_REPS", "2"))):
                t0 = time.time()
                sdf = registry.QUERIES[key](spark, WORK).toPandas()
                secs.append(round(time.time() - t0, 2))
        except Exception as exc:  # noqa: BLE001
            results[key] = {"secs": -1.0, "err": str(exc)[:200]}
            print(f"  {key}: SPARK ERROR {exc}", flush=True)
            continue
        t0 = time.time()
        odf = con.sql(registry.ORACLES[key]).df()
        osecs = round(time.time() - t0, 2)
        status, note = compare(sdf, odf)
        r = {"secs": min(secs), "reps": secs, "rows": len(sdf),
             "duck_secs": osecs, "match": status}
        if note:
            r["note"] = note
        if key in bench and bench[key] > 0:
            r["per_row_vs_sf01"] = round(min(secs) / (K * bench[key]), 3)
        results[key] = r
        print(f"  {key}: {status} {len(sdf)} rows, spark {min(secs)}s "
              f"{secs}, duck {osecs}s"
              + (f" [{note}]" if note else ""), flush=True)

    n_exact = sum(1 for r in results.values() if r.get("match") == "exact")
    n_quant = sum(1 for r in results.values() if r.get("match") == "quantum")
    n_bad = len(results) - n_exact - n_quant
    summary = {"K": K, "src": SRC, "n_keys": len(results),
               "exact": n_exact, "quantum": n_quant, "bad": n_bad,
               "results": results}
    print(json.dumps(summary), flush=True)
    if n_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
