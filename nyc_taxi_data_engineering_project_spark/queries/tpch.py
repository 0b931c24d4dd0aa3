"""Classic TPC-H query shapes (Q1, Q3, Q5, Q6, Q10, Q14) over the driver testdata.

These are the canonical analytics workloads for this star schema —
showcase keys proving the engine runs the textbook warehouse queries,
adapted only where the pared-down testdata lacks a column (Q3 has no
``o_shippriority``). Dates follow the testdata's 1995-2001 domain.

Physical posture per query:
- Q1: single scan + 4-group hash aggregate — pure map-side partial
  aggregation, the pattern every engine benchmarks first.
- Q3: fact⋈fact join (lineitem⋈orders) shuffled on orderkey with the
  customer dim broadcast; top-k via TakeOrderedAndProject.
- Q5: the 6-table snowflake — big joins shuffled, the always-tiny dims
  (nation/region) broadcast, customer/supplier strategy left to AQE,
  one hash aggregate.
- Q6: scan + predicate + single global agg; the predicates all push to
  the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import fx
from ..catalog import table
from ..registry import query

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           FLOOR(SUM(l_extendedprice) * 100.0 + 0.5) / 100.0 AS sum_base_price,
           FLOOR(SUM({_REV}) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
           FLOOR(SUM({_REV} * (1 + l_tax)) * 100.0 + 0.5) / 100.0 AS sum_charge,
           FLOOR(AVG(l_quantity) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
           FLOOR(AVG(l_discount) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY 1, 2
    """,
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary report (adapted dates)."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            fx.r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            fx.r2(F.sum(rev)).alias("sum_disc_price"),
            fx.r2(F.sum(rev * (1 + F.col("l_tax")))).alias("sum_charge"),
            fx.r4(F.avg("l_quantity")).alias("avg_qty"),
            fx.r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           FLOOR(SUM({_REV.replace('l_', 'l.l_')}) * 100.0 + 0.5) / 100.0
               AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY 1, 3
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping priority (adapted: testdata has no
    o_shippriority column; dates moved into the data's domain)."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(fx.r2(F.sum(rev)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
        .select("orderkey", "revenue", "orderdate")
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n.n_name AS nation,
           FLOOR(SUM({_REV.replace('l_', 'l.l_')}) * 100.0 + 0.5) / 100.0
               AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5 local-supplier volume: the 6-table snowflake with the
    local-supplier condition (customer and supplier share a nation).
    Broadcast hints only on nation/region (always tiny); customer and
    supplier scale with the fact tables, so their join strategy is left
    to AQE — broadcast under the threshold at test SF, shuffle beyond."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(fx.r2(F.sum(rev)).alias("revenue"))
    )


@query(
    "tpch_q6",
    oracle="""
    SELECT FLOOR(SUM(l_extendedprice * l_discount) * 100.0 + 0.5) / 100.0
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecasting revenue change — scan-heavy single aggregate;
    every predicate reaches the parquet scan."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(fx.r2(F.sum(F.col("l_extendedprice") * F.col("l_discount")))
             .alias("revenue"))
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
           FLOOR(SUM({_REV.replace('l_', 'l.l_')}) * 100.0 + 0.5) / 100.0
               AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10 returned-item reporting (adapted: no address/phone/
    comment columns in the testdata): top-20 customers by revenue lost to
    returns in a quarter. lineitem⋈orders shuffles on orderkey; customer
    joins AQE-decided; nation broadcast; top-k via
    TakeOrderedAndProject."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(fx.r2(F.sum(rev)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


@query(
    "tpch_q14",
    oracle="""
    SELECT FLOOR(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount))
                 * 10000.0 + 0.5) / 10000.0 AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14 promotion effect (adapted: testdata p_type is a flat
    category, so equality instead of LIKE 'PROMO%'): share of monthly
    revenue from promo parts. The date filter prunes lineitem at the
    scan; part joins on partkey (broadcast under threshold at test SF,
    shuffle at scale via AQE); one global aggregate."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    p = table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            fx.r4(100.0 * F.sum(promo) / F.sum(rev))
            .alias("promo_revenue_pct")
        )
    )
