"""A15 layout evidence at stress scale: ONE bucketed build of the two
fact tables (orders/lineitem on orderkey, io.write_bucketed) serving
the whole orderkey-join workload class — q9 (two-fact join + dims),
q18 (per-order aggregate + semi join + three-way join), q21 (two-level
aggregate + semi join) — on the K=100 corpus.

Per query: plain-parquet vs bucketed timings, Exchange counts, and a
result-equality assert. The point being measured: the bucketed
pre-shuffle is paid ONCE and every orderkey join/aggregate in the
workload stops shuffling the facts — including aggregates on key
SUPERSETS like q21's (l_orderkey, l_suppkey) level-1 group-by, which
Spark satisfies from the orderkey bucketing (same orderkey ⇒ same
bucket ⇒ (orderkey, suppkey) co-located).

Run: python scripts/bucketed_workload_probe.py [workdir]  → one JSON
line. Requires the stress_tpch K=100 workdir to exist.
"""

from __future__ import annotations

import json
import os
import re
import shutil
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


def q9_over(spark, li, o):
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    profit = (
        rev - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    p = table(spark, WORK, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, WORK, "supplier")
    n = table(spark, WORK, "nation")
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


def q18_over(spark, li, o):
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey")
    )
    oo = o.join(big, F.col("o_orderkey") == big.l_orderkey, "left_semi")
    c = table(spark, WORK, "customer")
    return (
        li.join(oo, li.l_orderkey == oo.o_orderkey)
        .join(c, oo.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


def q21_over(spark, li, o):
    per_os = (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
             .alias("is_ret"))
    )
    qualifying = (
        per_os.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"),
             F.sum("is_ret").alias("n_ret"),
             F.max(F.when(F.col("is_ret") == 1, F.col("l_suppkey")))
             .alias("ret_supp"))
        .filter((F.col("n_supp") > 1) & (F.col("n_ret") == 1))
        .select("l_orderkey", "ret_supp")
    )
    of = o.filter(F.col("o_orderstatus") == "F")
    ret = qualifying.join(of, F.col("l_orderkey") == of.o_orderkey,
                          "left_semi")
    n = table(spark, WORK, "nation").filter(F.col("n_name") == "NATION_2")
    s = (
        table(spark, WORK, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return (
        ret.join(F.broadcast(s), F.col("ret_supp") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("supp_name"))
        .limit(100)
    )


def q3_over(spark, li, o):
    # the DuckDB-favored cold-scan key (SCALE.md §13d ledger): its
    # li⋈o leg AND its orderkey-grain group-by ride the bucketing; the
    # o⋈customer leg keys on custkey and legitimately still shuffles —
    # an honest mixed-key member of the workload class.
    c = table(spark, WORK, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    of = o.filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    lif = li.filter(F.col("l_shipdate") > F.lit("1998-03-15"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lif.join(of, lif.l_orderkey == of.o_orderkey)
        .join(c, of.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(fx.r2(F.sum(rev)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
        .select("orderkey", "revenue", "orderdate")
    )


QUERIES = {"q9": q9_over, "q18": q18_over, "q21": q21_over,
           "q3": q3_over}

LI_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
           "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate"]
O_COLS = ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
          "o_orderstatus"]


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def main() -> None:
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(shuffle_partitions_for(WORK)))

    li_plain = table(spark, WORK, "lineitem").select(*LI_COLS)
    o_plain = table(spark, WORK, "orders").select(*O_COLS)

    t0 = time.time()
    nio.write_bucketed(o_plain, "bw_orders", "o_orderkey",
                       buckets=BUCKETS, path=f"{WORK}/bw_orders")
    nio.write_bucketed(li_plain, "bw_lineitem", "l_orderkey",
                       buckets=BUCKETS, path=f"{WORK}/bw_lineitem")
    build_s = round(time.time() - t0, 2)

    try:
        out: dict = {"workdir": WORK, "buckets": BUCKETS,
                     "build_s": build_s, "queries": {}}
        for qname, qfn in QUERIES.items():
            rec: dict = {}
            rows = {}
            for variant, (li, o) in {
                "plain": (li_plain, o_plain),
                "bucketed": (spark.table("bw_lineitem"),
                             spark.table("bw_orders")),
            }.items():
                secs = []
                for _ in range(REPS):
                    t0 = time.time()
                    rows[variant] = sorted(
                        map(tuple, qfn(spark, li, o).collect()))
                    secs.append(round(time.time() - t0, 2))
                rec[variant] = {"secs": min(secs), "reps": secs,
                                "exchanges": n_exchanges(qfn(spark, li, o))}
            rec["results_equal"] = rows["plain"] == rows["bucketed"]
            out["queries"][qname] = rec
            print(f"  {qname}: plain {rec['plain']['secs']}s/"
                  f"{rec['plain']['exchanges']}x vs bucketed "
                  f"{rec['bucketed']['secs']}s/"
                  f"{rec['bucketed']['exchanges']}x equal="
                  f"{rec['results_equal']}", flush=True)
        print(json.dumps(out))
    finally:
        spark.sql("DROP TABLE IF EXISTS bw_orders")
        spark.sql("DROP TABLE IF EXISTS bw_lineitem")
        shutil.rmtree(f"{WORK}/bw_orders", ignore_errors=True)
        shutil.rmtree(f"{WORK}/bw_lineitem", ignore_errors=True)


if __name__ == "__main__":
    main()
