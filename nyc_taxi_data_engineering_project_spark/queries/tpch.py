"""Classic TPC-H query shapes (Q1, Q3-Q6, Q10, Q13-Q15, Q17-Q19) over the driver testdata.

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


@query(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority AS orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 order-priority checking (adapted: testdata has no
    l_commitdate/l_receiptdate, so "late" means shipped >60 days after
    the order date). EXISTS compiles to a left-semi join on orderkey with
    the non-equi lateness predicate evaluated on the join — one shuffle,
    no row duplication, the planner never materializes the multi-match."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '5-LOW'
          GROUP BY 1) per_cust
    GROUP BY 1
    """,
)
def tpch_q13(spark, sf_dir):
    """TPC-H Q13 customer order-count distribution (adapted: the
    o_comment NOT LIKE filter becomes a priority filter — testdata has no
    comment columns). Left join keeps zero-order customers; COUNT of the
    nullable right key counts only matches. Two hash aggregates, both
    map-side partial; the second one's input is one row per customer."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             FLOOR(SUM({_REV}) * 100.0 + 0.5) / 100.0 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark, sf_dir):
    """TPC-H Q15 top supplier: quarterly revenue CTE reused twice (once
    per supplier, once for its global max). Revenue is rounded *before*
    the max comparison — floor(x·100+0.5)/100 is the identical IEEE
    expression in both engines, so the equality join is bit-stable
    (raw double sums differ in the last ulp by summation order).
    The scalar max broadcasts; the supplier dim joins the tiny agg."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(fx.r2(F.sum(rev)).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev),
                     revenue.total_revenue == max_rev.mr)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_revenue",
        )
    )


@query(
    "tpch_q17",
    oracle="""
    SELECT FLOOR(SUM(l.l_extendedprice) / 7.0 * 100.0 + 0.5) / 100.0
               AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
          FROM lineitem GROUP BY 1) pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND p.p_type = 'SMALL'
      AND l.l_quantity < pa.qty_cut
    """,
)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 small-quantity-order revenue (adapted: p_container →
    p_type). The correlated per-part AVG subquery is decorrelated into a
    pre-aggregate joined back on partkey — at scale this is one extra
    partial-agg pass instead of a per-row subquery, and both lineitem
    sides shuffle on the same key so AQE can reuse the exchange."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL")
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(fx.r2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "tpch_q18",
    oracle="""
    SELECT c.c_name AS name, c.c_custkey AS custkey,
           o.o_orderkey AS orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_totalprice AS totalprice,
           SUM(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY 1 HAVING SUM(l_quantity) > 180)
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18 large-volume customers: the IN-subquery over a HAVING
    aggregate becomes a left-semi join against the big-order keys. The
    per-orderkey quantity aggregate and the semi join share the orderkey
    shuffle; quantities are integral doubles so the >180 cut and the
    final SUM are exact in both engines."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


@query(
    "tpch_q19",
    oracle=f"""
    SELECT {fx.sql_round(f"SUM({_REV.replace('l_', 'l.l_')})", 2)} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark, sf_dir):
    """TPC-H Q19 discounted revenue (adapted: container/shipmode columns
    absent, so the disjunction is brand × size × quantity). The three
    OR-arms stay one equi join on partkey with the disjunctive residual
    evaluated post-join in codegen — Catalyst additionally derives the
    common `p_size <= 15` and brand-IN prefilters onto the part scan."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    arm = (
        ((b == "Brand#11") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#14") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#17") & sz.between(1, 15) & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(arm)
        .agg(fx.r2(F.sum(rev)).alias("revenue"))
    )
