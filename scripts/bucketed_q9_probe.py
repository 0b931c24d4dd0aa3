"""A15 layout evidence at stress scale: q9's two-fact orderkey join on
the K=100 corpus, plain parquet vs the bucketed layout
(io.write_bucketed on o_orderkey/l_orderkey).

Measures (1) the one-time bucketed-build cost, (2) the per-run query
time both ways, (3) asserts identical results, and (4) counts Exchange
nodes in both plans — the bucketed form must drop the fact-fact
shuffle (the layout is the amortized pre-shuffle a repeated
q9/q18-class workload buys once).

Run: python scripts/bucketed_q9_probe.py [workdir]  → one JSON line.
Requires the stress_tpch K=100 workdir to exist (reuses its parquet).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_engineering_project_spark import fx, io as nio  # noqa: E402
from nyc_taxi_data_engineering_project_spark.catalog import table  # noqa: E402
from nyc_taxi_data_engineering_project_spark.session import (  # noqa: E402
    get_session, shuffle_partitions_for,
)

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_tpch100"
BUCKETS = 32
REPS = int(os.environ.get("REPS", "2"))


def q9_over(spark, li, o, sf_dir):
    """The q9 plan over caller-supplied lineitem/orders frames."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    profit = (
        rev - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(fx.r2(F.sum(profit).cast("double")).alias("sum_profit"))
    )


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def main() -> None:
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(shuffle_partitions_for(WORK)))

    li_plain = table(spark, WORK, "lineitem")
    o_plain = table(spark, WORK, "orders")

    t0 = time.time()
    nio.write_bucketed(o_plain.select("o_orderkey", "o_orderdate"),
                       "bq9_orders", "o_orderkey", buckets=BUCKETS,
                       path=f"{WORK}/bq9_orders")
    nio.write_bucketed(
        li_plain.select("l_orderkey", "l_partkey", "l_suppkey",
                        "l_quantity", "l_extendedprice", "l_discount"),
        "bq9_lineitem", "l_orderkey", buckets=BUCKETS,
        path=f"{WORK}/bq9_lineitem")
    build_s = round(time.time() - t0, 2)

    try:
        variants = {
            "plain": lambda: q9_over(spark, li_plain, o_plain, WORK),
            "bucketed": lambda: q9_over(spark, spark.table("bq9_lineitem"),
                                        spark.table("bq9_orders"), WORK),
        }
        out: dict = {"workdir": WORK, "buckets": BUCKETS,
                     "build_s": build_s}
        rows = {}
        for name, fn in variants.items():
            secs = []
            for _ in range(REPS):
                t0 = time.time()
                rows[name] = sorted(map(tuple, fn().collect()))
                secs.append(round(time.time() - t0, 2))
            out[name] = {"secs": min(secs), "reps": secs,
                         "exchanges": n_exchanges(fn())}
        out["results_equal"] = rows["plain"] == rows["bucketed"]
        print(json.dumps(out))
    finally:
        spark.sql("DROP TABLE IF EXISTS bq9_orders")
        spark.sql("DROP TABLE IF EXISTS bq9_lineitem")
        import shutil

        shutil.rmtree(f"{WORK}/bq9_orders", ignore_errors=True)
        shutil.rmtree(f"{WORK}/bq9_lineitem", ignore_errors=True)


if __name__ == "__main__":
    main()
