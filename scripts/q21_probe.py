"""Round-7 probe: q21 current (two lineitem scans: count_distinct pair
with Expand + distinct ret scan) vs single-scan rewrite (one
per-(orderkey,suppkey) aggregate feeding both order_stats and ret via
exchange reuse). Run at an SF dir; prints timings + plan evidence."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_engineering_project_spark import registry  # noqa: E402
from nyc_taxi_data_engineering_project_spark.catalog import table  # noqa: E402
from nyc_taxi_data_engineering_project_spark.session import get_session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(os.environ.get("REPS", "3"))


def q21_new(spark, sf_dir):
    per_os = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_suppkey")
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
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    ret = qualifying.join(o, F.col("l_orderkey") == o.o_orderkey,
                          "left_semi")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return (
        ret.join(s, F.col("ret_supp") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("supp_name"))
        .limit(100)
    )


def main():
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    old = registry.QUERIES["tpch_q21"]

    rows_old = sorted(map(tuple, old(spark, SF).collect()))
    rows_new = sorted(map(tuple, q21_new(spark, SF).collect()))
    print("results equal:", rows_old == rows_new, f"({len(rows_old)} rows)")

    plan = q21_new(spark, SF)._jdf.queryExecution().executedPlan().toString()
    print("new plan lineitem scans:", plan.count("lineitem.parquet"),
          "| ReusedExchange:", "ReusedExchange" in plan,
          "| Expand:", "Expand" in plan)
    plan_o = old(spark, SF)._jdf.queryExecution().executedPlan().toString()
    print("old plan lineitem scans:", plan_o.count("lineitem.parquet"),
          "| Expand:", "Expand" in plan_o)

    for name, fn in (("old", old), ("new", q21_new)):
        secs = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, SF).collect()
            secs.append(round(time.time() - t0, 2))
        print(name, secs, "min", min(secs))


if __name__ == "__main__":
    main()
