"""Remaining TPC-H query shapes (Q2, Q7-Q9, Q11-Q13, Q15-Q17, Q19-Q22)
adapted to the fixture schema.

The fixtures lack ``partsupp``, ``l_shipmode``, ``l_commitdate`` /
``l_receiptdate``, ``c_phone`` and ``p_container``, so each query keeps the
*shape* that makes the original interesting (min-agg join-back, nation-pair
volume, conditional market share, scalar-subquery thresholds, disjunctive
pushdown, EXISTS/NOT-EXISTS stacking, histogram-of-counts) while sourcing
its predicates from columns that exist. Reference parity: the reference
engine (mapreduce.c:165-192) has no joins or subqueries at all — these are
the "complete analytics engine" surface SURVEY.md §2.2 mandates Spark-side.

Exactness: money through functions.fixed_point; ratio outputs computed with
the identical float expression on both engines; threshold comparisons kept
in pure integer arithmetic wherever possible (see small_qty_revenue,
important_parts) so no float boundary can flip a row in or out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.functions import (
    duck_fixed_point,
    duck_money_sum,
    fixed_point,
    money_sum,
)
from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table


def _supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier × nation × region (10 × 25 × 5 rows — always broadcast)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("supp_nation"),
                F.col("r_name").alias("supp_region"))
    )


@register(
    "min_cost_supplier",
    oracle="""
WITH costs AS (
  SELECT p_partkey, p_name, s_name, s_acctbal,
         min(CAST(floor((l_extendedprice / l_quantity) * 100 + 0.5) AS BIGINT)) AS cost_fx
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size < 15
  GROUP BY p_partkey, p_name, s_name, s_acctbal
)
SELECT p_partkey, p_name, s_name, s_acctbal, cost_fx / 100 AS unit_cost
FROM costs
QUALIFY cost_fx = min(cost_fx) OVER (PARTITION BY p_partkey)
""",
    tags=("tpch-shape", "join", "window", "min-agg"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the EUROPE supplier offering the minimum
    unit price (no partsupp fixture — unit cost is min(l_extendedprice /
    l_quantity) observed on lineitem, fixed-point quantized so the min and
    the equality join-back are integer-exact).

    Shuffle story: one exchange on (p_partkey, supplier attrs) for the
    min-agg, one on p_partkey for the window min; supplier/nation/region
    and part are broadcast (dims). Ties (several suppliers at the same
    min) are all kept, as in Q2.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 15)
    )
    sup = _supplier_nations(spark, sf_dir).filter(F.col("supp_region") == "EUROPE")
    unit_fx = fixed_point(F.col("l_extendedprice") / F.col("l_quantity"))
    costs = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name", "s_name", "s_acctbal")
        .agg(F.min(unit_fx).alias("cost_fx"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("min_fx", F.min("cost_fx").over(w))
        .filter(F.col("cost_fx") == F.col("min_fx"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal",
                (F.col("cost_fx") / 100).alias("unit_cost"))
    )


@register(
    "volume_shipping",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {duck_money_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region sr ON sn.n_regionkey = sr.r_regionkey
JOIN region cr ON cn.n_regionkey = cr.r_regionkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND sr.r_name <> cr.r_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
""",
    tags=("tpch-shape", "join", "multi-dim"),
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-region trade volume by (supplier nation,
    customer nation, year). The original's two-nation filter is widened to
    "different regions" so the 10-supplier fixture always produces rows.

    Shuffle story: one fact-fact exchange (lineitem ⋈ orders on orderkey);
    customer and both nation/region dims broadcast; final agg exchanges on
    the 3-part group key. 100 TB: the orderkey join is the cost — both
    sides hash-partition on the key, AQE handles skew.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"),
                F.col("r_name").alias("cust_region"))
    )
    sup = _supplier_nations(spark, sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(F.col("supp_region") != F.col("cust_region"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "market_share",
    oracle=f"""
SELECT year(o_orderdate) AS o_year,
       round(
         (sum(CASE WHEN sr.r_name = 'ASIA' THEN {duck_fixed_point('l_extendedprice * (1 - l_discount)')} ELSE 0 END) / 100.0)
         / (sum({duck_fixed_point('l_extendedprice * (1 - l_discount)')}) / 100.0),
         6
       ) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region cr ON cn.n_regionkey = cr.r_regionkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN region sr ON sn.n_regionkey = sr.r_regionkey
WHERE cr.r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
""",
    tags=("tpch-shape", "join", "conditional", "share"),
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: ASIA suppliers' share of ECONOMY-part revenue sold
    to AMERICA customers, by order year. Numerator and denominator are both
    exact fixed-point sums; the share division is the identical IEEE
    expression on both engines.

    Shuffle story: one lineitem ⋈ orders exchange; every dim (customer-
    nation-region, part, supplier-nation-region) broadcasts; one final
    1-key-per-year agg exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    sup = _supplier_nations(spark, sf_dir)
    rev_fx = fixed_point(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    asia_fx = F.when(F.col("supp_region") == "ASIA", rev_fx).otherwise(F.lit(0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey, "left_semi")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                (F.sum(asia_fx) / 100.0) / (F.sum(rev_fx) / 100.0), 6
            ).alias("mkt_share")
        )
    )


@register(
    "product_profit",
    oracle=f"""
SELECT n_name AS supp_nation, year(o_orderdate) AS o_year,
       {duck_money_sum('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity', 'sum_profit')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
""",
    tags=("tpch-shape", "join", "aggregation"),
)
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on widget parts by supplier nation × year.
    No partsupp fixture, so supply cost is proxied as 60% of p_retailprice
    per unit; the profit expression is written with identical association
    on both engines ((0.6 * r) * q) before fixed-point quantization.

    Shuffle story: lineitem ⋈ orders is the one big exchange; part and
    supplier-nation broadcast; final agg on (nation, year).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    sup = _supplier_nations(spark, sf_dir)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(
            F.col("supp_nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(money_sum(profit, "sum_profit"))
        .withColumnRenamed("supp_nation", "supp_nation")
    )


@register(
    "important_parts",
    oracle=f"""
WITH v AS (
  SELECT l_partkey, sum({duck_fixed_point('l_extendedprice')}) AS value_fx
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey AS partkey, value_fx / 100 AS part_value
FROM v
WHERE 10 * value_fx * (SELECT count(*) FROM v) > 12 * (SELECT sum(value_fx) FROM v)
""",
    tags=("tpch-shape", "subquery", "having"),
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds 1.2× the average
    part value (scalar-subquery threshold, scale-invariant — a fixed
    fraction-of-total goes empty as |part| grows). The comparison is pure
    integer (10 * value_fx * n_parts > 12 * total_fx) — no float boundary.

    Shuffle story: one agg exchange on l_partkey; the grand total+count is
    a 1-row broadcast joined back. 100 TB note: 10*value_fx*n_parts must
    stay < 2^63; at extreme |part|·value products switch to DECIMAL.
    """
    li = load_table(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(
        F.sum(fixed_point("l_extendedprice")).alias("value_fx")
    )
    total = v.groupBy().agg(
        F.sum("value_fx").alias("total_fx"), F.count("*").alias("n_parts")
    )
    return (
        v.crossJoin(F.broadcast(total))
        .filter(10 * F.col("value_fx") * F.col("n_parts") > 12 * F.col("total_fx"))
        .select(F.col("l_partkey").alias("partkey"),
                (F.col("value_fx") / 100).alias("part_value"))
    )


@register(
    "priority_shipping",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""",
    tags=("tpch-shape", "join", "conditional"),
)
def priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high- vs low-priority line counts per line status
    (l_shipmode is absent from the fixture; l_linestatus plays the
    category role). Conditional-count aggregation after one fact-fact
    join.

    Shuffle story: lineitem ⋈ orders exchange on orderkey, then a 2-group
    agg — partial aggregation makes the final exchange negligible.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "customer_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
""",
    tags=("tpch-shape", "outer-join", "histogram"),
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of non-urgent orders per customer,
    customers with zero such orders included via the left outer join
    (count(o_orderkey) skips NULLs, exactly like SQL COUNT(col)).

    Shuffle story: outer join exchanges on custkey, first agg reuses that
    partitioning (no extra exchange), second agg exchanges on the tiny
    c_count domain.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"), "left"
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS suppkey, sum({duck_fixed_point('l_extendedprice * (1 - l_discount)')}) AS total_fx
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_fx / 100 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = suppkey
WHERE total_fx = (SELECT max(total_fx) FROM rev)
""",
    tags=("tpch-shape", "subquery", "max"),
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    the scalar MAX subquery joined back by exact equality (integer cents,
    so ties and equality are deterministic).

    Shuffle story: one agg exchange on suppkey; the max is a 1-row
    broadcast; supplier dim broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(fixed_point(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_fx")
    )
    mx = rev.groupBy().agg(F.max("total_fx").alias("max_fx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_fx") == F.col("max_fx"))
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", (F.col("total_fx") / 100).alias("total_revenue"))
    )


@register(
    "parts_supplier_cnt",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#12' AND p_type NOT IN ('PROMO', 'ECONOMY')
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p_brand, p_type, p_size
""",
    tags=("tpch-shape", "join", "count-distinct"),
)
def parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers trade each surviving
    (brand, type, size) combination — the part-supplier relationship
    observed through lineitem since there is no partsupp fixture.

    Shuffle story: part broadcasts into lineitem; COUNT(DISTINCT) expands
    to a two-level agg (distinct exchange on group+suppkey, then final on
    the group key) — both partial-aggregated map-side.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#12")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "small_qty_revenue",
    oracle=f"""
WITH pq AS (
  SELECT l_partkey AS pk, sum({duck_fixed_point('l_quantity')}) AS qsum_fx, count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT (sum({duck_fixed_point('l_extendedprice')}) / 100) / 7.0 AS avg_yearly,
       count(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq ON pk = l_partkey
WHERE p_brand = 'Brand#23'
  AND 5 * {duck_fixed_point('l_quantity')} * cnt < qsum_fx
""",
    tags=("tpch-shape", "subquery", "correlated"),
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity Brand#23 orders —
    lines with quantity below 20% of their part's average. The correlated
    AVG is decorrelated into a per-part agg joined back, and the
    "qty < 0.2 * avg" predicate is rewritten in pure integers
    (5 * qty_fx * cnt < sum_fx): no float division, no boundary flips.

    Shuffle story: per-part agg exchanges on partkey (~|part| rows →
    broadcast back into lineitem); final 1-row global agg. 100 TB: the
    per-part table scales with |part|, still broadcastable; else the
    join reuses the partkey partitioning.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(fixed_point("l_quantity")).alias("qsum_fx"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(F.broadcast(pq), F.col("l_partkey") == F.col("pk"))
        .filter(F.lit(5) * fixed_point("l_quantity") * F.col("cnt") < F.col("qsum_fx"))
        .groupBy()
        .agg(
            ((F.sum(fixed_point("l_extendedprice")) / 100) / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "disjunctive_revenue",
    oracle=f"""
SELECT {duck_money_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#14' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
""",
    tags=("tpch-shape", "join", "disjunctive"),
)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    bands — the classic disjunctive-predicate pushdown test (p_container
    is absent; p_size bands replace it).

    Shuffle story: part broadcasts; the disjunction is evaluated post-join
    (it references both sides) but each side's prunable conjuncts
    (brand/size on part) still reach the scans; 1-row final agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#14") & q.between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .groupBy()
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "excess_shipments",
    oracle=f"""
WITH shipped AS (
  SELECT l_suppkey AS suppkey, sum({duck_fixed_point('l_quantity')}) AS qty_fx
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%rod%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
)
SELECT s_name, n_name, qty_fx / 100 AS total_qty
FROM supplier
JOIN shipped ON s_suppkey = suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE qty_fx > 30000
""",
    tags=("tpch-shape", "subquery", "semi"),
)
def excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than 300 units of rod
    parts in 1997 (the available-quantity subquery of Q20, re-anchored on
    shipment volume since there is no partsupp.availqty). Threshold in
    integer cents (30000 = 300.00).

    Shuffle story: part broadcasts into lineitem; one agg exchange on
    suppkey; supplier/nation broadcast for the final enrich.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%rod%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(fixed_point("l_quantity")).alias("qty_fx"))
        .filter(F.col("qty_fx") > 30000)
    )
    return (
        shipped.join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name", (F.col("qty_fx") / 100).alias("total_qty"))
    )


@register(
    "waiting_orders",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN orders ON l1.l_orderkey = o_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
""",
    tags=("tpch-shape", "exists", "anti"),
)
def waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole supplier who returned items on a
    finished multi-supplier order (l_receiptdate/l_commitdate are absent;
    l_returnflag = 'R' stands in for "failed to deliver on time"). Stacked
    EXISTS → left-semi and NOT EXISTS → left-anti, both with a non-equi
    suppkey-differs conjunct on the orderkey equi-join.

    Implementation decorrelates both EXISTS into one pass of per-order
    aggregates: an R-line row satisfies them iff its order has >1 distinct
    suppliers and exactly 1 distinct R-supplier — in which case every
    R-line in the order belongs to that single supplier, so numwait is the
    order's R-line count attributed to it. Row-for-row identical to the
    stacked-EXISTS SQL. Both distinct-cardinality tests only need the
    1-vs-many distinction, so they are computed as min/max comparisons
    (countDistinct == 1 ⟺ min == max over non-nulls; > 1 ⟺ min != max),
    which removes the count-distinct Expand/double-exchange entirely and
    lets BOTH tests ride ONE groupBy(l_orderkey) over ONE lineitem scan
    (conditional min/max/count on the R subset).

    Shuffle story (r21, guide §2.3/§2.4 — was: two aggs on l_orderkey,
    2 exchanges each from countDistinct, two lineitem scans, 5 exchanges
    total): ONE agg exchange on l_orderkey carrying five small columns,
    then the F-orders side prunes to bare keys and BROADCASTS into the
    semi join; supplier broadcasts; final agg on s_name. 2 exchanges,
    1 lineitem scan. 100 TB note: the orders-keys broadcast only holds
    while the pruned F-subset fits the broadcast threshold; at full
    fact-table scale drop the hint and let AQE pick shuffle-vs-broadcast
    from runtime stats (the rest of the plan is scale-invariant).
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    is_r = F.col("l_returnflag") == "R"
    r_supp = F.when(is_r, F.col("l_suppkey"))
    stats = li.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
        F.min(r_supp).alias("min_r_supp"),
        F.max(r_supp).alias("max_r_supp"),
        F.count(F.when(is_r, F.lit(1))).alias("n_r_lines"),
    )
    return (
        stats.filter(
            # n_supp > 1 ⟺ min != max; n_r_supp == 1 ⟺ R-min == R-max
            # (null-safe by construction: an order with no non-null
            # R-suppkey yields NULL min/max → the equality is NULL →
            # filtered, exactly like countDistinct == 1 failing at 0)
            (F.col("min_supp") != F.col("max_supp"))
            & (F.col("min_r_supp") == F.col("max_r_supp"))
        )
        .join(F.broadcast(o), F.col("l_orderkey") == o.o_orderkey, "left_semi")
        .join(F.broadcast(s), F.col("max_r_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_r_lines").alias("numwait"))
    )


@register(
    "dormant_customers",
    oracle=f"""
WITH pool AS (
  SELECT * FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
),
thresh AS (
  SELECT (CAST(sum({duck_fixed_point('c_acctbal')}) AS DOUBLE) / 100) / count(*) AS avg_bal
  FROM pool WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS numcust,
       {duck_money_sum('c_acctbal', 'totacctbal')}
FROM pool, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_mktsegment
""",
    tags=("tpch-shape", "anti", "scalar-subquery"),
)
def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone dormant — above the
    segment pool's average positive balance (scalar subquery; the average
    is an exact integer-cents sum divided by count with identical IEEE
    ops on both engines) and no order since 2000 (NOT EXISTS → left-anti;
    c_phone is absent so segments replace country codes).

    Shuffle story: the threshold is a 1-row broadcast; the anti join
    exchanges on custkey (recent-orders side pre-projected to the key);
    final agg on the 3-value segment key.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pool = c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE")
    )
    thresh = (
        pool.filter(F.col("c_acctbal") > 0)
        .groupBy()
        .agg(
            (
                (F.sum(fixed_point("c_acctbal")).cast("double") / 100) / F.count("*")
            ).alias("avg_bal")
        )
    )
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01").select(
        F.col("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            money_sum("c_acctbal", "totacctbal"),
        )
    )
