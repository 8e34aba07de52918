"""Additional TPC-H-shaped analytical queries adapted to the fixture
schema (Q1/Q3/Q5 shapes live in relational.py / joins.py). These exercise
the classic OLAP patterns — EXISTS aggregation, selective scan-sum,
outer-join top-N, conditional revenue share, HAVING-gated semi join —
with the repo's exactness conventions (fixed-point sums, deterministic
ordering)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.functions import (
    duck_fixed_point,
    duck_money_sum,
    fixed_point,
    money_sum,
)
from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table


@register(
    "order_priority_check",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
    tags=("tpch-shape", "join", "semi", "aggregation"),
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS against the fact table then priority counts
    (left-semi join keeps the orders scan lean)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "forecast_revenue",
    oracle=f"""
SELECT {duck_money_sum('l_extendedprice * l_discount', 'revenue')},
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("tpch-shape", "filter", "aggregation"),
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective multi-predicate scan + global sum —
    the pushdown-or-die query (all three predicates reach the parquet
    scan; no shuffle beyond the final 1-row combine)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .groupBy()
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "returned_items",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {duck_money_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("tpch-shape", "join", "topk"),
)
def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue — 4-way join,
    grouped revenue, deterministic top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "promo_revenue_share",
    oracle=f"""
SELECT round(
         100.0 * (sum(CASE WHEN p_type LIKE 'PROMO%' THEN {duck_fixed_point('l_extendedprice * (1 - l_discount)')} ELSE 0 END) / 100.0)
         / (sum({duck_fixed_point('l_extendedprice * (1 - l_discount)')}) / 100.0),
         6
       ) AS promo_share_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
""",
    tags=("tpch-shape", "join", "conditional"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share over a month window
    (PROMO-typed parts). Both numerator and denominator are exact fixed-point."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev_fx = fixed_point(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo_fx = F.when(F.col("p_type").startswith("PROMO"), rev_fx).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy()
        .agg(
            F.round(
                100.0 * (F.sum(promo_fx) / 100.0) / (F.sum(rev_fx) / 100.0), 6
            ).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "large_volume_customers",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING sum({duck_fixed_point('l_quantity')}) / 100 > 150
)
SELECT c_custkey, o_orderkey, o_totalprice,
       {duck_money_sum('l_quantity', 'total_qty')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_custkey, o_orderkey, o_totalprice
""",
    tags=("tpch-shape", "join", "having", "subquery"),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING-gated subquery), joined back to customers — the aggregate
    feeds a semi join on the fact key."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg((F.sum(fixed_point("l_quantity")) / 100).alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(money_sum("l_quantity", "total_qty"))
    )
