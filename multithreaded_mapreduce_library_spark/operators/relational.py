"""Relational operator inventory: filters, projections, aggregations,
distinct, grouping sets/rollup/cube, set ops, sorts/limits, conditional
aggregation, pivot, scalar functions (string/math/date).

The reference has only two built-in predicates (NULL/empty-key drops,
mapreduce.c:205-207 and 254-256) and user-code aggregation (distwc.c:23-34);
everything else here is capability the reference lacks (SURVEY.md §2.2
"ABSENT" rows), expressed declaratively so Catalyst handles pushdown,
pruning, partial aggregation and join strategy. Every query pairs with a
DuckDB oracle via the registry.

Exactness conventions (see registry module doc): fixed-point money sums,
string-formatted dates, double division only on exact inputs.

Shuffle stories by family (100 TB invariants, asserted for the headline
shapes in tests/test_plans.py):
- scalar/filter/projection ops (scalar_*, case_when, sample_hash,
  filter_project, json paths): NARROW — zero exchanges; predicates and
  column pruning ride the parquet scan.
- plain aggregates (agg_*, count_distinct, having_filter,
  conditional_agg, percentiles, variance/corr): ONE agg exchange with
  map-side partials — only per-group accumulators cross the wire, never
  rows. Multi-distinct and cube/rollup/grouping-sets add the Expand node
  before the same single exchange; pivot is the same agg with widened
  accumulators.
- set ops: UNION ALL is a no-shuffle concat; INTERSECT/EXCEPT (and the
  ALL forms) plan as one exchange per side on the full row hash.
- sorts/limits: global top-N is TakeOrderedAndProject (per-partition
  heads, no full sort); unpivot/explode paths are narrow fan-out.
- subqueries: scalar subqueries broadcast their 1-row result;
  decorrelated correlated subqueries become the agg+join shapes above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.functions import (
    duck_fixed_point,
    duck_money_sum,
    duck_tokens,
    fixed_point,
    money_sum,
    tokens,
)
from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table, register_views


# ---------------------------------------------------------------------------
# filters / projections
# ---------------------------------------------------------------------------

@register(
    "filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05
""",
    tags=("relational", "filter", "projection"),
    doc="Predicate + projection; both pushed into the parquet scan by Catalyst.",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= "1998-01-01") & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


# ---------------------------------------------------------------------------
# aggregations
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {duck_money_sum('l_quantity', 'sum_qty')},
       {duck_money_sum('l_extendedprice', 'sum_base_price')},
       {duck_money_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {duck_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       (sum({duck_fixed_point('l_quantity')}) / 100) / count(*) AS avg_qty,
       (sum({duck_fixed_point('l_extendedprice')}) / 100) / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("relational", "aggregation", "flagship"),
    doc=(
        "TPC-H Q1-shaped pricing summary. The Spark agg gets map-side partial "
        "aggregation — the combiner the reference's shuffle lacks "
        "(mapreduce.c:204-222, SURVEY.md §2.2)."
    ),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(charge, "sum_charge"),
            ((F.sum(fixed_point("l_quantity")) / 100) / F.count("*")).alias("avg_qty"),
            ((F.sum(fixed_point("l_extendedprice")) / 100) / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_stats",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price,
       {duck_money_sum('o_totalprice', 'sum_price')},
       (sum({duck_fixed_point('o_totalprice')}) / 100) / count(*) AS avg_price
FROM orders
GROUP BY o_orderpriority
""",
    tags=("relational", "aggregation"),
    doc="count/min/max/sum/avg in one grouped aggregate (hash agg + partials).",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        money_sum("o_totalprice", "sum_price"),
        ((F.sum(fixed_point("o_totalprice")) / 100) / F.count("*")).alias("avg_price"),
    )


@register(
    "count_distinct",
    oracle="""
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
    tags=("relational", "aggregation", "distinct"),
    doc="Distinct aggregation (expand + two-phase agg under the hood).",
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "multi_count_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("relational", "aggregation", "distinct"),
)
def multi_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two different DISTINCT columns in one aggregate — Spark plans this
    with an Expand node (one replicated stream per distinct set) feeding a
    two-phase agg, so each distinct set still partial-aggregates map-side;
    one exchange on (group key, gid)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("*").alias("n_rows"),
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("relational", "distinct"),
    doc=(
        "Row-level distinct. Generalizes the reference's key-level dedup "
        "directory (unique_keys, mapreduce.c:123-132)."
    ),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "having_filter",
    oracle="""
SELECT o_custkey, count(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 12
""",
    tags=("relational", "aggregation", "filter"),
    doc="Post-aggregation predicate (HAVING).",
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "agg_listagg",
    oracle="""
SELECT s_nationkey AS nationkey,
       string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
       count(*) AS n_suppliers
FROM supplier
GROUP BY s_nationkey
""",
    tags=("relational", "aggregation", "listagg"),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg). collect_list is
    order-nondeterministic under parallel merge, so the deterministic form
    is collect → array_sort → array_join (supplier names are unique, so the
    sort is total). One shuffle on the group key; the sort is per-group
    post-shuffle, never global."""
    s = load_table(spark, sf_dir, "supplier")
    return s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"),
        F.count("*").alias("n_suppliers"),
    )


@register(
    "agg_mode",
    oracle="""
WITH c AS (
  SELECT o_custkey, o_orderpriority, count(*) AS cnt
  FROM orders GROUP BY o_custkey, o_orderpriority
), r AS (
  SELECT c.*, row_number() OVER (
    PARTITION BY o_custkey ORDER BY cnt DESC, o_orderpriority
  ) AS rn FROM c
)
SELECT o_custkey AS custkey,
       o_orderpriority AS modal_priority,
       cnt AS n_orders
FROM r WHERE rn = 1
""",
    tags=("relational", "aggregation", "mode"),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: most frequent order priority per
    customer, ties broken by the smaller priority string (native mode() is
    tie-nondeterministic in both engines, so both sides spell out the
    count + row_number ranking). Two exchanges — (custkey, priority) for
    the count, custkey for the window; the first is partial-aggregated
    map-side so only distinct pairs cross the wire."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    counted = o.groupBy("o_custkey", "o_orderpriority").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("cnt").alias("n_orders"),
        )
    )


@register(
    "agg_bool",
    oracle="""
SELECT o_orderstatus,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
    tags=("relational", "aggregation", "boolean"),
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (EVERY / ANY): universal and existential
    predicates per group in one shuffle with map-side partials — a
    two-value lattice, so partial merge is just AND/OR."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.count("*").alias("n_orders"),
    )


@register(
    "agg_argmax",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_totalprice, o_orderkey,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
)
SELECT o_custkey AS custkey,
       o_orderkey AS top_orderkey,
       o_totalprice AS top_price
FROM r WHERE rn = 1
""",
    tags=("relational", "aggregation", "argmax"),
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax in a single aggregate: each customer's highest-priced order
    as max of struct(price, -orderkey) — lexicographic struct comparison
    gives max price with min-orderkey tie-break, matching the oracle's
    row_number ordering. ONE exchange with map-side partials; the window
    formulation (window_topk_per_group) needs a full per-group sort —
    at 100 TB the struct-max is the cheaper plan for k=1."""
    o = load_table(spark, sf_dir, "orders")
    best = F.max(
        F.struct(
            F.col("o_totalprice").alias("p"),
            (-F.col("o_orderkey")).alias("negk"),
        )
    ).alias("best")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(best)
        .select(
            "custkey",
            (-F.col("best.negk")).alias("top_orderkey"),
            F.col("best.p").alias("top_price"),
        )
    )


@register(
    "calendar_fill",
    oracle="""
WITH per_day AS (
  SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
  GROUP BY 1
)
SELECT strftime(t.d, '%Y-%m-%d') AS day,
       coalesce(p.n_orders, 0) AS n_orders
FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1995-03-31',
                     INTERVAL 1 DAY) t(d)
LEFT JOIN per_day p ON p.day = t.d
""",
    tags=("relational", "date", "sequence"),
)
def calendar_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: daily order counts over Q1 1995 including
    zero-order days. The date spine is generated inline with
    sequence() + explode (no driver loop, no external table) and the
    aggregated per-day counts — tiny after the groupBy — are broadcast
    into the left join, so the only exchange is the count's."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
    )
    per_day = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n_orders")
    )
    cal = spark.range(1).select(
        F.explode(
            F.sequence(F.to_date(F.lit("1995-01-01")), F.to_date(F.lit("1995-03-31")))
        ).alias("day")
    )
    return cal.join(F.broadcast(per_day), "day", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# grouping sets / rollup / cube
# ---------------------------------------------------------------------------

@register(
    "group_rollup",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS grp_id,
       count(*) AS n_orders,
       {duck_money_sum('o_totalprice', 'sum_price')}
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("relational", "rollup"),
)
def group_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (status → status+priority → grand total)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("grp_id"),
        F.count("*").alias("n_orders"),
        money_sum("o_totalprice", "sum_price"),
    ).select("o_orderstatus", "o_orderpriority", "grp_id", "n_orders", "sum_price")


@register(
    "group_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS grp_id,
       count(*) AS cnt
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("relational", "cube"),
)
def group_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^n grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("grp_id"),
        F.count("*").alias("cnt"),
    ).select("l_returnflag", "l_linestatus", "grp_id", "cnt")


@register(
    "grouping_sets",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS grp_id,
       count(*) AS n_orders,
       {duck_money_sum('o_totalprice', 'sum_price')}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
    tags=("relational", "grouping-sets", "sql-api"),
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL API (spark.sql path coverage)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping_id(o_orderstatus, o_orderpriority) AS grp_id,
               count(*) AS n_orders,
               sum(floor(o_totalprice * 100 + 0.5)) / 100 AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

@register(
    "setop_union",
    oracle="""
SELECT nationkey, count(*) AS cnt FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY nationkey
""",
    tags=("relational", "setop"),
    doc=(
        "UNION ALL. The reference's multi-file input is an implicit union of "
        "splits (mapreduce.c:173-175); this is the explicit operator."
    ),
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).groupBy("nationkey").agg(F.count("*").alias("cnt"))


@register(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
    tags=("relational", "setop"),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
""",
    tags=("relational", "setop"),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "setop_intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey FROM supplier
""",
    tags=("relational", "setop", "multiset"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — min of the two multiplicities per
    value). One shuffle on the value, like a distinct-free semi-merge."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "setop_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey FROM supplier
""",
    tags=("relational", "setop", "multiset"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicities subtract, floor 0)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


# ---------------------------------------------------------------------------
# sorts / limits
# ---------------------------------------------------------------------------

@register(
    "orderby_limit",
    oracle="""
SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    tags=("relational", "sort", "limit"),
    doc=(
        "Global top-N (TakeOrderedAndProject — no full sort at scale). The "
        "reference has no sort at all (SURVEY.md §2.2); tiebreak on the "
        "unique key makes the limit deterministic."
    ),
)
def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# conditional expressions / pivot
# ---------------------------------------------------------------------------

@register(
    "case_when",
    oracle=f"""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS price_tier,
       count(*) AS n_orders,
       {duck_money_sum('o_totalprice', 'sum_price')}
FROM orders
GROUP BY 1
""",
    tags=("relational", "case"),
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + grouped aggregate."""
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return o.groupBy(tier.alias("price_tier")).agg(
        F.count("*").alias("n_orders"),
        money_sum("o_totalprice", "sum_price"),
    )


@register(
    "conditional_agg",
    oracle=f"""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       sum(CASE WHEN o_orderstatus = 'F' THEN {duck_fixed_point('o_totalprice')} ELSE 0 END) / 100 AS finished_price
FROM orders
GROUP BY o_orderpriority
""",
    tags=("relational", "aggregation", "case"),
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (count FILTER, sum CASE)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        (
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F", fixed_point("o_totalprice")
                ).otherwise(F.lit(0))
            )
            / 100
        ).alias("finished_price"),
    )


@register(
    "pivot_status",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders
GROUP BY o_orderpriority
""",
    tags=("relational", "pivot"),
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status values into columns (explicit value list — no
    extra distinct-values job, which matters at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


# ---------------------------------------------------------------------------
# subqueries
# ---------------------------------------------------------------------------

@register(
    "scalar_subquery",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 3 * (SELECT (sum(floor(o_totalprice * 100 + 0.5)) / 100) / count(*) FROM orders)
""",
    tags=("relational", "subquery", "sql-api"),
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders 3× above the mean price)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 3 * (
            SELECT (sum(floor(o_totalprice * 100 + 0.5)) / 100) / count(*) FROM orders
        )
        """
    )


@register(
    "sample_hash",
    oracle=f"""
SELECT doc_id, n_chars
FROM documents
WHERE (('0x' || substr(md5(text), 1, 15))::BIGINT) % 10 = 0
""",
    tags=("relational", "sampling"),
    doc=(
        "Deterministic hash-based sampling — the scale-safe alternative to "
        "TABLESAMPLE (reproducible across engines and runs)."
    ),
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from multithreaded_mapreduce_library_spark.functions import md5_long60

    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.pmod(md5_long60(F.col("text")), F.lit(10)) == 0).select(
        "doc_id", "n_chars"
    )


# ---------------------------------------------------------------------------
# scalar functions
# ---------------------------------------------------------------------------

@register(
    "scalar_string",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substr(p_type, 1, 5) AS type_prefix,
       length(p_name) AS name_len,
       concat(p_brand, '#', p_type) AS brand_type,
       replace(p_name, ' ', '_') AS name_snake,
       regexp_extract(p_name, '[a-z]+') AS first_word,
       strpos(p_type, 'a') AS a_pos,
       trim(lpad(p_brand, 12, ' ')) AS brand_trim
FROM part
""",
    tags=("relational", "scalar", "string"),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function coverage: case, substr, length, concat, replace,
    regexp_extract, position, pad/trim."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_name", "[a-z]+", 0).alias("first_word"),
        F.instr(F.col("p_type"), "a").alias("a_pos"),
        F.trim(F.lpad("p_brand", 12, " ")).alias("brand_trim"),
    )


@register(
    "scalar_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_orderkey % 7 AS key_mod,
       round(abs(l_discount - 0.05), 4) AS disc_dev,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(floor(l_quantity / 2) AS BIGINT) AS qty_half_floor,
       floor(sqrt(l_extendedprice) * 1000000 + 0.5) / 1000000 AS price_sqrt,
       round(ln(l_extendedprice + 1), 6) AS price_ln,
       round(pow(1 - l_discount, 2), 8) AS disc_sq
FROM lineitem
WHERE l_orderkey % 100 = 0
""",
    tags=("relational", "scalar", "math"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function coverage: mod, abs, ceil/floor, sqrt, ln, pow (rounded
    where libm vs JVM could differ in the last ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 2).alias("qty_half_floor"),
        # floor-quantized, not round(): engines' round() can flip near
        # decimal boundaries at this magnitude (see pandas_udf_scalar)
        (F.floor(F.sqrt("l_extendedprice") * 1_000_000 + F.lit(0.5)) / 1_000_000).alias(
            "price_sqrt"
        ),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 - F.col("l_discount"), 2), 8).alias("disc_sq"),
    )


@register(
    "scalar_date",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       day(o_orderdate) AS order_day,
       quarter(o_orderdate) AS order_quarter,
       isodow(o_orderdate) AS order_isodow,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month_start
FROM orders
WHERE o_orderkey % 50 = 0
""",
    tags=("relational", "scalar", "date"),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function coverage: extract fields, ISO weekday, datediff,
    interval arithmetic, truncation."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        # Spark weekday(): Monday=0; ISO dow is Monday=1 (duck isodow)
        (F.weekday(F.col("o_orderdate")) + 1).cast("long").alias("order_isodow"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month_start"
        ),
    )


# ---------------------------------------------------------------------------
# array / map scalar functions
# ---------------------------------------------------------------------------

@register(
    "scalar_array",
    oracle=f"""
WITH t AS (SELECT doc_id, {duck_tokens('text')} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       array_to_string(toks[1:3], '_') AS first3,
       array_to_string(list_sort(toks[1:3]), '_') AS first3_sorted,
       list_contains(toks, 'the') AS has_the,
       len(list_distinct(toks)) AS n_distinct,
       toks[len(toks)] AS last_token
FROM t WHERE len(toks) > 0
""",
    tags=("relational", "scalar", "array"),
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function coverage: slice, sort, contains, distinct, element
    access — higher-order array ops stay JVM-side (no UDFs)."""
    d = load_table(spark, sf_dir, "documents")
    from multithreaded_mapreduce_library_spark.functions import tokens

    t = d.select("doc_id", tokens("text").alias("toks")).filter(F.size("toks") > 0)
    return t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.array_join(F.slice("toks", 1, 3), "_").alias("first3"),
        F.array_join(F.array_sort(F.slice("toks", 1, 3)), "_").alias("first3_sorted"),
        F.array_contains("toks", "the").alias("has_the"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.element_at("toks", F.size("toks")).alias("last_token"),
    )


@register(
    "scalar_map",
    oracle="""
SELECT event_type,
       CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 10
                       WHEN 'signup' THEN 5 ELSE 0 END AS weight,
       count(*) AS cnt,
       count(*) * (CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 10
                                   WHEN 'signup' THEN 5 ELSE 0 END) AS weighted
FROM events
GROUP BY event_type
""",
    tags=("relational", "scalar", "map"),
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType coverage: literal map construction + element_at lookup with a
    default (the oracle expresses the identical lookup semantics as CASE —
    DuckDB's MAP type has no hashable wire format to compare directly)."""
    e = load_table(spark, sf_dir, "events")
    weights = F.create_map(
        F.lit("click"), F.lit(1),
        F.lit("view"), F.lit(2),
        F.lit("purchase"), F.lit(10),
        F.lit("signup"), F.lit(5),
    )
    w = F.coalesce(F.element_at(weights, F.col("event_type")), F.lit(0))
    return (
        e.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            "event_type",
            F.coalesce(F.element_at(weights, F.col("event_type")), F.lit(0)).alias("weight"),
            "cnt",
            (F.col("cnt") * F.coalesce(F.element_at(weights, F.col("event_type")), F.lit(0))).alias(
                "weighted"
            ),
        )
    )


@register(
    "lateral_posexplode",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {duck_tokens('text')} AS toks
  FROM documents WHERE doc_id % 20 = 0
)
SELECT doc_id,
       generate_subscripts(toks, 1) - 1 AS pos,
       unnest(toks) AS token
FROM t WHERE len(toks) > 0
""",
    tags=("relational", "lateral", "explode"),
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (LATERAL VIEW posexplode): each token with its
    0-based position — the position-aware generator the plain explode
    loses. Narrow (Generate node, no shuffle); the oracle zips DuckDB's
    unnest with generate_subscripts, which expand positionally in step."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    t = d.select("doc_id", tokens("text").alias("toks")).filter(F.size("toks") > 0)
    return t.select("doc_id", F.posexplode("toks").alias("pos", "token"))


# ---------------------------------------------------------------------------
# exact percentiles
# ---------------------------------------------------------------------------

@register(
    "percentiles",
    oracle="""
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       count(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
    tags=("relational", "aggregation", "percentile"),
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark percentile() and
    DuckDB quantile_cont share the linear-interpolation definition). At
    scale prefer approx_percentile with a set error bound — exact
    percentile sorts each group."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# skew-salted aggregation
# ---------------------------------------------------------------------------

N_SALTS = 8


@register(
    "agg_salted_skew",
    oracle=f"""
SELECT l_returnflag,
       count(*) AS n_items,
       {duck_money_sum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("relational", "aggregation", "skew", "salting"),
    doc=(
        f"Two-phase salted aggregation over a 3-value (maximally skewed) "
        f"key: phase 1 groups by (key, salt={N_SALTS} buckets from a row-"
        "local column) computing partial integer sums, phase 2 merges "
        "partials per key. Semantics-preserving by construction (integer "
        "sums are associative), so the oracle is the PLAIN group-by — the "
        "manual form of what AQE skew handling does, for when the skew is "
        "in an aggregation rather than a join."
    ),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(N_SALTS)))
    phase1 = salted.groupBy("l_returnflag", "salt").agg(
        F.count("*").alias("pc"),
        F.sum(fixed_point("l_quantity")).alias("ps"),
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("pc").alias("n_items"),
        (F.sum("ps") / 100).alias("sum_qty"),
    )


@register(
    "unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, value
FROM (
  SELECT l_orderkey, l_linenumber,
         unnest(['quantity', 'extendedprice', 'discount']) AS measure,
         unnest([l_quantity, l_extendedprice, l_discount]) AS value
  FROM lineitem
)
WHERE l_orderkey % 500 = 0
""",
    tags=("relational", "unpivot"),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide measures -> long key/value rows) via the native
    unpivot operator — the inverse of pivot_status."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    ).withColumn("measure", F.expr("substring(measure, 3)"))


@register(
    "variance_stats",
    oracle="""
WITH d AS (
  SELECT o_orderpriority, CAST(floor(o_totalprice + 0.5) AS BIGINT) AS x
  FROM orders
)
SELECT o_orderpriority, n, var_pop_price, sqrt(var_pop_price) AS stddev_pop_price
FROM (
  SELECT o_orderpriority,
         count(*) AS n,
         (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE)
          - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
         / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE)) AS var_pop_price
  FROM d GROUP BY o_orderpriority
)
""",
    tags=("relational", "aggregation", "statistics"),
    doc=(
        "Population variance/stddev computed from EXACT integer sums "
        "(dollar-rounded values; sum(x) and sum(x*x) are overflow-checked "
        "int64), converted to double once and combined with the identical "
        "IEEE formula in both engines — deterministic where native "
        "var_pop would drift with partitioning order. Bound: |x| <= 7e5, "
        "so sum(x*x) < 2^63 up to ~1.8e7 rows per group; beyond that "
        "switch the squares to DECIMAL."
    ),
)
def variance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    x = F.floor(F.col("o_totalprice") + 0.5)
    g = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(x * x).alias("sx2"),
        F.sum(x).alias("sx"),
    )
    nd = F.col("n").cast("double")
    var = (nd * F.col("sx2").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")) / (nd * nd)
    return g.select(
        "o_orderpriority",
        "n",
        var.alias("var_pop_price"),
        F.sqrt(var).alias("stddev_pop_price"),
    )


@register(
    "correlated_subquery",
    oracle="""
SELECT l_partkey, count(*) AS n_min_items, min(l_orderkey) AS first_order
FROM lineitem l
WHERE l_quantity = (
  SELECT min(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l_partkey
""",
    tags=("relational", "subquery", "sql-api"),
)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2/Q17 shape): rows matching their
    group's minimum. Catalyst decorrelates this into an aggregate + self
    join — no per-row re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_partkey, count(*) AS n_min_items, min(l_orderkey) AS first_order
        FROM lineitem l
        WHERE l_quantity = (
          SELECT min(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l_partkey
        """
    )


@register(
    "scd2_merge",
    oracle="""
WITH updates AS (
  SELECT c_custkey, c_acctbal * 2 AS new_acctbal
  FROM customer WHERE c_custkey % 10 = 0
),
unchanged AS (
  SELECT c.c_custkey, c.c_acctbal, 1 AS version, TRUE AS is_current
  FROM customer c WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
),
expired AS (
  SELECT c.c_custkey, c.c_acctbal, 1 AS version, FALSE AS is_current
  FROM customer c JOIN updates u ON u.c_custkey = c.c_custkey
),
fresh AS (
  SELECT c_custkey, new_acctbal AS c_acctbal, 2 AS version, TRUE AS is_current
  FROM updates
)
SELECT * FROM unchanged UNION ALL SELECT * FROM expired UNION ALL SELECT * FROM fresh
""",
    tags=("relational", "merge", "scd2"),
    doc=(
        "SCD2 / MERGE-INTO emulation without a table format (pyspark guide "
        "'CDC/SCD2' pattern): anti-join keeps unchanged rows current, "
        "matched rows are expired and re-inserted as a new version. With "
        "Delta/Iceberg this collapses to one MERGE; plan shape (one "
        "join + union) is the same."
    ),
)
def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", (F.col("c_acctbal") * 2).alias("new_acctbal")
    )
    unchanged = c.join(updates, "c_custkey", "left_anti").select(
        "c_custkey",
        "c_acctbal",
        F.lit(1).alias("version"),
        F.lit(True).alias("is_current"),
    )
    expired = c.join(updates.select("c_custkey"), "c_custkey").select(
        "c_custkey",
        "c_acctbal",
        F.lit(1).alias("version"),
        F.lit(False).alias("is_current"),
    )
    fresh = updates.select(
        "c_custkey",
        F.col("new_acctbal").alias("c_acctbal"),
        F.lit(2).alias("version"),
        F.lit(True).alias("is_current"),
    )
    return unchanged.unionAll(expired).unionAll(fresh)


@register(
    "corr_stats",
    oracle="""
WITH d AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity) AS BIGINT) AS x,
         CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * y) AS DOUBLE) AS sxy,
         CAST(sum(x * x) AS DOUBLE) AS sx2, CAST(sum(y * y) AS DOUBLE) AS sy2
  FROM d GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 9) AS corr_qty_price,
       round((n * sxy - sx * sy) / (CAST(n AS DOUBLE) * n), 4) AS covar_pop
FROM m
""",
    tags=("relational", "aggregation", "statistics"),
    doc=(
        "Pearson correlation + population covariance of (quantity, price) "
        "per return flag, from EXACT integer moment sums (sum x, y, xy, "
        "x2, y2 as int64) combined with the identical IEEE formula on "
        "both engines — native corr()/covar_pop() drift with partition "
        "merge order. Bound: |y| <= ~1.1e5 dollars, so sum(y*y) < 2^63 up "
        "to ~7.6e8 rows per group; DECIMAL beyond."
    ),
)
def corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle story: one map-side-combined agg exchange on the 3-value
    return flag; five integer moments travel, never the rows."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.floor(F.col("l_quantity"))
    y = F.floor(F.col("l_extendedprice") + 0.5)
    g = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("isx"), F.sum(y).alias("isy"),
        F.sum(x * y).alias("isxy"),
        F.sum(x * x).alias("isx2"), F.sum(y * y).alias("isy2"),
    )
    n = F.col("n")
    sx, sy = F.col("isx").cast("double"), F.col("isy").cast("double")
    sxy = F.col("isxy").cast("double")
    sx2, sy2 = F.col("isx2").cast("double"), F.col("isy2").cast("double")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy)
    )
    covar = (n * sxy - sx * sy) / (n.cast("double") * n)
    return g.select(
        "l_returnflag",
        "n",
        F.round(corr, 9).alias("corr_qty_price"),
        F.round(covar, 4).alias("covar_pop"),
    )


_SQL_INTERFACE_TEXT = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM orders
WHERE o_orderdate >= {d0} AND o_orderdate < {d1}
GROUP BY o_orderpriority
"""


@register(
    "sql_interface",
    oracle=_SQL_INTERFACE_TEXT.format(d0="DATE '1996-01-01'", d1="DATE '1997-01-01'"),
    tags=("sql-api", "agg"),
    doc=(
        "The spark.sql() surface: the fixture tables registered as temp "
        "views and the query written as SQL text — the same string (up to "
        "date-literal spelling) runs on DuckDB as the oracle. Catalyst "
        "plans SQL text and DataFrame calls identically (same logical "
        "plan), so everything the plan audits assert for the DataFrame "
        "API holds here too: pushed date filter, pruned scan, partial "
        "aggregation. The engine is API-complete in the Spark sense: "
        "DataFrame, SQL, RDD facade (mapreduce module), and Streaming."
    ),
)
def sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        _SQL_INTERFACE_TEXT.format(d0="DATE'1996-01-01'", d1="DATE'1997-01-01'")
    )


@register(
    "dist_moments",
    oracle="""
WITH d AS (
  SELECT l_returnflag, CAST(floor(l_quantity) AS BIGINT) AS x FROM lineitem
),
m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(x) AS DOUBLE) AS s1,
         CAST(sum(x * x) AS DOUBLE) AS s2,
         CAST(sum(x * x * x) AS DOUBLE) AS s3,
         CAST(sum(x * x * x * x) AS DOUBLE) AS s4
  FROM d GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(mu, 6) AS mean_qty,
       round(m2, 6) AS var_pop_qty,
       round(m3 / (m2 * sqrt(m2)), 6) AS skewness_qty,
       round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis_qty
FROM (
  SELECT l_returnflag, n,
         s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4.0 * (s1 / n) * (s3 / n)
               + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM m
)
""",
    tags=("relational", "aggregation", "statistics"),
    doc=(
        "Skewness / excess kurtosis per group from EXACT integer power "
        "sums (x = floor(l_quantity) <= 50, so sum(x^4) stays far under "
        "2^63 to ~3.7e12 rows per group): the four moments are computed "
        "as int64 sums — order-independent, one agg exchange with "
        "map-side partials — then combined with the identical IEEE "
        "expression in both engines. Native skewness()/kurtosis() use "
        "engine-specific streaming algorithms whose float results drift "
        "with partitioning; moment sums don't. Shuffle story: ONE agg "
        "exchange carrying five integers per group."
    ),
)
def dist_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.floor(F.col("l_quantity"))
    g = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("is1"),
        F.sum(x * x).alias("is2"),
        F.sum(x * x * x).alias("is3"),
        F.sum(x * x * x * x).alias("is4"),
    )
    nd = F.col("n").cast("double")
    s1, s2 = F.col("is1").cast("double"), F.col("is2").cast("double")
    s3, s4 = F.col("is3").cast("double"), F.col("is4").cast("double")
    mu = s1 / nd
    m2 = s2 / nd - mu * mu
    m3 = s3 / nd - F.lit(3.0) * mu * (s2 / nd) + F.lit(2.0) * mu * mu * mu
    m4 = (
        s4 / nd
        - F.lit(4.0) * mu * (s3 / nd)
        + F.lit(6.0) * mu * mu * (s2 / nd)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    return g.select(
        "l_returnflag",
        "n",
        F.round(mu, 6).alias("mean_qty"),
        F.round(m2, 6).alias("var_pop_qty"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness_qty"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("excess_kurtosis_qty"),
    )


# ---------------------------------------------------------------------------
# skyline / pareto frontier
# ---------------------------------------------------------------------------

@register(
    "pareto_frontier",
    oracle="""
SELECT a.p_partkey, a.p_retailprice, a.p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
""",
    tags=("relational", "skyline", "pareto"),
    doc=(
        "2-D skyline (pareto frontier): parts not dominated on (minimize "
        "p_retailprice, maximize p_size). The oracle states the O(n^2) "
        "NOT-EXISTS definition; the Spark plan is the linear rewrite — a "
        "2-D skyline is a prefix-max scan: reduce to one row per distinct "
        "price (partial-aggregated exchange, max size per price), running "
        "max over strictly-cheaper prices on that REDUCED frame, keep "
        "price levels whose max size strictly beats it, then broadcast "
        "the (tiny) frontier back onto the base table to recover the "
        "winning rows (equal-price equal-size ties all kept, strict "
        "dominance). Shuffle story: ONE wide exchange (the price-level "
        "agg); the ordered prefix-max runs on |distinct prices| rows — "
        "if that were ever too large for one task, the scan splits into "
        "per-range-partition maxima + a broadcast prefix of partition "
        "offsets, same algebra. Dominated rows never reach a sort or a "
        "join; the naive per-pair formulation is unrunnable at 100 TB."
    ),
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    lvl = p.groupBy("p_retailprice").agg(F.max("p_size").alias("m2"))
    prefix = W.orderBy("p_retailprice").rowsBetween(W.unboundedPreceding, -1)
    sky = lvl.withColumn("m1", F.max("m2").over(prefix)).filter(
        F.col("m1").isNull() | (F.col("m1") < F.col("m2"))
    )
    return (
        p.join(F.broadcast(sky), "p_retailprice")
        .filter(F.col("p_size") == F.col("m2"))
        .select("p_partkey", "p_retailprice", "p_size")
    )


# ---------------------------------------------------------------------------
# data profiling / skew diagnostics
# ---------------------------------------------------------------------------

# (column, kind) pairs profiled on lineitem; kind picks the cross-engine
# exact string rendering for min/max (no raw double->string casts, whose
# formatting differs between engines).
_PROFILE_COLS = (
    ("l_orderkey", "int"),
    ("l_quantity", "double"),
    ("l_extendedprice", "double"),
    ("l_returnflag", "string"),
    ("l_shipdate", "ts"),
)


def _fmt(col, kind: str):
    c = F.col(col)
    if kind == "int":
        return c.cast("string")
    if kind == "double":
        return F.format_string("%.2f", c)
    if kind == "ts":
        return F.date_format(c, "yyyy-MM-dd")
    return c


def _duck_fmt(expr: str, kind: str) -> str:
    if kind == "int":
        return f"CAST({expr} AS VARCHAR)"
    if kind == "double":
        return f"printf('%.2f', {expr})"
    if kind == "ts":
        return f"strftime({expr}, '%Y-%m-%d')"
    return expr


@register(
    "profile_table",
    oracle=f"""
WITH a AS (
  SELECT
    {", ".join(
        f"CAST(count(*) - count({c}) AS BIGINT) AS nn_{c},"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c},"
        f" {_duck_fmt(f'min({c})', k)} AS mn_{c},"
        f" {_duck_fmt(f'max({c})', k)} AS mx_{c}"
        for c, k in _PROFILE_COLS
    )}
  FROM lineitem
)
{" UNION ALL ".join(
    f"SELECT '{c}' AS col_name, nn_{c} AS n_nulls, nd_{c} AS n_distinct,"
    f" mn_{c} AS min_value, mx_{c} AS max_value FROM a"
    for c, _ in _PROFILE_COLS
)}
""",
    tags=("relational", "profiling", "llm-pipeline"),
    doc=(
        "Table profiling: null count, EXACT distinct count and min/max "
        "for five lineitem columns, one output row per column. r21 "
        "(guide §2.3 'aggregate before you shuffle'): min/max/null "
        "counts ride one scan; each column's EXACT distinct count is its "
        "own column-pruned partial-dedup aggregate (distinct -> count), "
        "joined back as five 1-row broadcasts — the old single-agg "
        "five-way countDistinct planned through Expand, multiplying "
        "every input row SIX-fold through the exchange (measured at "
        "sf0.1: 6.8-11.2s -> 0.9-1.7s, values identical; each profiled "
        "column is scanned twice — once in the base min/max/null scan "
        "and once in its own distinct subtree, ~2x column bytes read — "
        "in exchange for eliminating the 6N-row Expand through the "
        "exchange). The 1-row result unpivots "
        "driver-free via an inline struct array. min/max render through "
        "engine-agreeing formatters (printf-style for doubles, ISO "
        "dates) — never a raw double->string cast. At 100 TB this is "
        "the profile you run BEFORE choosing join strategies; "
        "everything reduces map-side, nothing wide."
    ),
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # min/max aggregate typed; the cross-engine formatter applies on the
    # 1-row result, not per input row
    typed = li.groupBy().agg(
        *(
            a
            for c, k in _PROFILE_COLS
            for a in (F.min(c).alias(f"mn0_{c}"), F.max(c).alias(f"mx0_{c}"))
        ),
        *(
            (F.count("*") - F.count(c)).cast("long").alias(f"nn_{c}")
            for c, _ in _PROFILE_COLS
        ),
    )
    # per-column exact distinct: distinct() dedups map-side per
    # partition before the exchange, and count(c) over the distinct rows
    # ignores the (at most one) NULL row — exactly countDistinct's
    # non-null semantics, without the six-way Expand
    for c, _ in _PROFILE_COLS:
        nd = (
            li.select(c)
            .distinct()
            .groupBy()
            .agg(F.count(c).cast("long").alias(f"nd_{c}"))
        )
        typed = typed.crossJoin(F.broadcast(nd))
    rows = F.array(
        *(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                _fmt(f"mn0_{c}", k).alias("min_value"),
                _fmt(f"mx0_{c}", k).alias("max_value"),
            )
            for c, k in _PROFILE_COLS
        )
    )
    return typed.select(F.explode(rows).alias("p")).select("p.*")


SKEW_TOP_K = 10


@register(
    "skew_diagnose",
    oracle=f"""
WITH c AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM orders),
r AS (
  SELECT o_custkey, n_orders,
         row_number() OVER (ORDER BY n_orders DESC, o_custkey) AS rank
  FROM c
)
SELECT r.rank, r.o_custkey, r.n_orders,
       (r.n_orders * 1000000) // t.total AS share_ppm
FROM r, t WHERE r.rank <= {SKEW_TOP_K}
""",
    tags=("relational", "skew", "diagnostics"),
    doc=(
        f"Join-key skew report: the {SKEW_TOP_K} heaviest o_custkey "
        "values with their exact counts and integer parts-per-million "
        "share of the table — the diagnostic you run BEFORE deciding "
        "between a plain shuffle join, salting (join_skew_salted) or an "
        "AQE skew split. Shuffle story: one partial-aggregated exchange "
        "to per-key counts, then TakeOrderedAndProject for the top-K "
        "(rank materialized over the K-row frame only — the full key "
        "frame is never globally sorted) and a broadcast 1-row total. "
        "Deterministic: ties broken on the key; share is integer ppm."
    ),
)
def skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    top = c.orderBy(F.col("n_orders").desc(), F.col("o_custkey")).limit(SKEW_TOP_K)
    t = o.agg(F.count("*").cast("long").alias("total"))
    w = W.orderBy(F.col("n_orders").desc(), F.col("o_custkey"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(t))
        .select(
            "rank",
            "o_custkey",
            "n_orders",
            F.expr("(n_orders * 1000000) div total").alias("share_ppm"),
        )
    )


HIST_NB = 10  # equi-width buckets per group


@register(
    "histogram_fixed",
    oracle=f"""
WITH x AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v_c
  FROM lineitem
),
b AS (SELECT flag, min(v_c) AS mn, max(v_c) AS mx FROM x GROUP BY flag),
k AS (
  SELECT x.flag,
         CAST(least(((x.v_c - b.mn) * {HIST_NB}) // (b.mx - b.mn + 1),
                    {HIST_NB} - 1) AS BIGINT) AS bucket,
         x.v_c
  FROM x JOIN b USING (flag)
)
SELECT flag, bucket,
       count(*) AS n_rows,
       min(v_c) / 100 AS lo_value,
       max(v_c) / 100 AS hi_value
FROM k GROUP BY flag, bucket
""",
    tags=("relational", "profiling", "histogram"),
    doc=(
        f"Per-group equi-width histogram ({HIST_NB} buckets of "
        "l_extendedprice per return flag): bucket assignment is pure "
        "integer arithmetic over fixed-point cents — ((v - min) * NB) "
        "div (range + 1), capped — so both engines bin identically with "
        "no float-boundary ambiguity; bucket edges are reported as the "
        "ACTUAL min/max in each bucket (exact). Shuffle story: one tiny "
        "per-group min/max agg broadcast back onto the scan, then ONE "
        "partial-aggregated exchange on (flag, bucket) — the histogram "
        "frame is |groups| x NB rows regardless of table size, the "
        "right shape for 100 TB profiling."
    ),
)
def histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        fixed_point("l_extendedprice").cast("long").alias("v_c"),
    )
    b = x.groupBy("flag").agg(F.min("v_c").alias("mn"), F.max("v_c").alias("mx"))
    k = x.join(F.broadcast(b), "flag").select(
        "flag",
        F.least(
            F.expr(f"((v_c - mn) * {HIST_NB}) div (mx - mn + 1)"),
            F.lit(HIST_NB - 1),
        )
        .cast("long")
        .alias("bucket"),
        "v_c",
    )
    return k.groupBy("flag", "bucket").agg(
        F.count("*").alias("n_rows"),
        (F.min("v_c") / 100).alias("lo_value"),
        (F.max("v_c") / 100).alias("hi_value"),
    )
