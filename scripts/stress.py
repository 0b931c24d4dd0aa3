"""Scale-up smoke: run headline keys at K× the largest local testdata.

The driver testdata stops at sf0.1 (~600 k lineitem rows); this script
materializes a K×-replicated copy (re-keyed so join/group cardinalities
scale realistically: each copy shifts its key space, so orders/lineitem
keep 1:N integrity and dedup/doc ops see K× distinct documents) and runs
the headline keys on it. The point is not the absolute numbers — it is
that wall-clock grows ~linearly and no key falls off a cliff
(hot-bucket blowup, driver collect, state explosion) between sf0.1 and
~sf1. Run: ``python scripts/stress.py [K] [workdir]``.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_engineering_project_spark import catalog, registry  # noqa: E402
from nyc_taxi_data_engineering_project_spark.session import get_session  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_stress"

# key-shift per replica: keeps referential integrity (orders.o_orderkey ↔
# lineitem.l_orderkey shift together) while scaling distinct-key counts
_SHIFT = 100_000_000
_REKEY: dict[str, list[str]] = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    # user_id shifts with the replica so per-user event DENSITY stays
    # constant: K× users with the same per-user timeline is the realistic
    # scale-up (10× verbatim rows per user would inflate d11's per-user
    # click×purchase pairs ~K² and merge c36's sessions — degenerate
    # workloads that false-fail the linearity check, same reasoning as
    # the text/embedding perturbation below)
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_SMALL = ("region", "nation")  # dims copied as-is (fixed domain)

HEADLINE = [
    "flagship_daily_region_revenue", "tpch_q1", "tpch_q3", "tpch_q5",
    "tpch_q9", "tpch_q18", "tpch_q21", "c33_salted_join", "c11_percentiles",
    "f1_exact_dedup", "f2_minhash_dedup", "f10_simhash", "f11_ngram_jaccard",
    "f25_boilerplate_removal", "f26_passage_dedup", "f29_unigram_logprob",
    "f3_lsh_ann",
    # streaming + sessionization: added r4 after the timestamp-unit fix —
    # the r2 stress predates correct event times, so the watermark/state
    # scale behavior below is the first honest measurement. d11's state is
    # bounded by watermark+interval (not stream length); d2's by window
    # count; c36 is the one-shuffle batch sessionize.
    "c36_sessionize", "d2_watermark", "d11_stream_stream_join",
]


def main() -> None:
    registry.load_all()
    spark = get_session("stress")

    if os.path.isdir(WORK):
        shutil.rmtree(WORK)
    os.makedirs(WORK)

    t0 = time.time()
    for name in _SMALL:
        shutil.copy(f"{SRC}/{name}.parquet", f"{WORK}/{name}.parquet")
    for name, keys in _REKEY.items():
        # catalog.table handles events' TIMESTAMP(NANOS) → micros; the
        # replica then persists micro timestamps, which read back plainly
        df = catalog.table(spark, SRC, name)
        copies = None
        for i in range(K):
            c = df
            for kcol in keys:
                if kcol in df.columns:
                    c = c.withColumn(kcol, F.col(kcol) + F.lit(i * _SHIFT))
            # perturb CONTENT, not just keys: verbatim replica text/
            # embeddings would make every dup group K× wider and every
            # LSH bucket K× hotter (candidate pairs ~K²) — a degenerate
            # workload that false-fails the linearity check. A replica
            # prefix shifts all block/gram boundaries (distinct docs);
            # a tiny per-replica embedding offset separates vectors.
            if "text" in df.columns and i > 0:
                c = c.withColumn(
                    "text", F.concat(F.lit(f"r{i} "), F.col("text"))
                )
            if "embedding" in df.columns and i > 0:
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x: (x + F.lit(i * 1e-3)).cast("float"),
                    ),
                )
            copies = c if copies is None else copies.unionAll(c)
        copies.write.mode("overwrite").parquet(f"{WORK}/{name}.parquet")
    print(f"materialized {K}x testdata in {time.time()-t0:.0f}s -> {WORK}")

    results: dict[str, float] = {}
    for key in HEADLINE:
        t0 = time.time()
        try:
            registry.QUERIES[key](spark, WORK).write.format("noop").mode(
                "overwrite"
            ).save()
            results[key] = round(time.time() - t0, 2)
            print(f"  {key}: {results[key]}s")
        except Exception as exc:  # noqa: BLE001
            print(f"  {key}: ERROR {exc}")
            results[key] = -1.0
        spark.catalog.clearCache()
    total = sum(t for t in results.values() if t > 0)
    print(f"TOTAL {total:.1f}s for {len(results)} keys at {K}x sf "
          f"({SRC})")


if __name__ == "__main__":
    main()
