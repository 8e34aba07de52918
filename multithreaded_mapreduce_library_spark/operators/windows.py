"""Window-function inventory — ranking, analytic, and frame-based ops,
all absent from the reference (SURVEY.md §2.2).

Determinism discipline for oracle-exactness: every ORDER BY inside a window
either ends with a unique key (o_orderkey) or only feeds rank/dense_rank
(whose outputs depend on sort-key values, not tie order). Running sums go
through fixed-point integers so the frame accumulation is exact in both
engines.

Shuffle story (whole family): exactly ONE window exchange on the
partition key + an in-partition sort; frames never cross partitions, so
at 100 TB the cost is one shuffle of the carried columns regardless of
frame width. Unpartitioned windows (ntile/range_frame/share over the
global ordering) single-partition by construction — fine for the
post-aggregate row counts they run on here; for global windows over raw
facts, range-partition first (the standard rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.functions import fixed_point
from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table


@register(
    "window_rank",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice, rnk, drnk FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
         dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
  FROM orders
) WHERE rnk <= 10
""",
    tags=("window", "rank"),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank per priority class (tie-stable by construction)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 10)
    )


@register(
    "window_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    tags=("window", "topk"),
    doc=(
        "Top-k per group via row_number with a full tiebreak — the standard "
        "scale pattern (single shuffle on the group key; no global sort)."
    ),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       count(*) OVER w AS n_orders_so_far,
       (sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w / 100) AS spend_so_far
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame", "running"),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count + running (fixed-point-exact) sum per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("n_orders_so_far"),
        (F.sum(fixed_point("o_totalprice")).over(w) / 100).alias("spend_so_far"),
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       coalesce(date_diff('day',
                CAST(lag(o_orderdate) OVER w AS DATE),
                CAST(o_orderdate AS DATE)), -1) AS days_since_prev,
       coalesce(lead(o_orderkey) OVER w, -1) AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window", "analytic"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: per-customer inter-order gap and next order."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ),
            F.lit(-1),
        ).alias("days_since_prev"),
        F.coalesce(F.lead("o_orderkey").over(w), F.lit(-1)).alias("next_orderkey"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT o_orderkey, o_totalprice,
       count(*) OVER w AS n_in_band,
       (sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w / 100) AS sum_in_band
FROM orders
WINDOW w AS (ORDER BY o_totalprice RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame", "range"),
    doc=(
        "RANGE frame over a numeric ordering (value-based, not row-based): "
        "all orders within $500 below the current price."
    ),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice").rangeBetween(-500, W.currentRow)
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_in_band"),
        (F.sum(fixed_point("o_totalprice")).over(w) / 100).alias("sum_in_band"),
    )


@register(
    "window_ntile",
    oracle="""
SELECT o_orderkey,
       ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_quartile
FROM orders
""",
    tags=("window", "ntile"),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile assignment (unique ordering makes tiles deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    return o.select("o_orderkey", F.ntile(4).over(w).alias("price_quartile"))


@register(
    "window_first_last",
    oracle="""
SELECT DISTINCT o_custkey,
       first_value(o_orderkey) OVER w AS best_orderkey,
       last_value(o_orderkey) OVER w AS worst_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window", "analytic"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full-partition frame (the
    default frame would make last_value the current row)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("best_orderkey"),
            F.last("o_orderkey").over(w).alias("worst_orderkey"),
        )
        .distinct()
    )


@register(
    "window_share",
    oracle="""
SELECT event_type, cnt,
       round(cnt / (sum(cnt) OVER ()), 8) AS share
FROM (SELECT event_type, CAST(count(*) AS DOUBLE) AS cnt FROM events GROUP BY event_type)
""",
    tags=("window", "analytic", "aggregation"),
)
def window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-window share-of-total (unpartitioned window over an aggregate)."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(F.count("*").cast("double").alias("cnt"))
    return per_type.select(
        "event_type",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(W.partitionBy()), 8).alias("share"),
    )


@register(
    "window_distribution",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 8) AS pct_rank,
       round(cume_dist() OVER w, 8) AS cum_dist,
       nth_value(o_orderkey, 3) OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
""",
    tags=("window", "distribution"),
    doc=(
        "Distribution analytics: percent_rank/cume_dist (tie-safe — they "
        "depend only on sort-key values) and nth_value with an explicit "
        "full-partition frame and unique ordering."
    ),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    w_nth = (
        W.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cum_dist"),
        F.nth_value("o_orderkey", 3).over(w_nth).alias("third_orderkey"),
    )


@register(
    "window_moving_avg",
    oracle="""
SELECT o_custkey, o_orderkey,
       ((sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w / 100)
        / count(*) OVER w) AS moving_avg_price,
       count(*) OVER w AS n_in_window
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame", "moving-average"),
    doc=(
        "Trailing 7-order moving average per customer: the classic "
        "smoothing frame, exact via fixed-point sums divided back once "
        "(a native double avg() would drift with frame-slide order). "
        "Shuffle story: the family's single window exchange on "
        "o_custkey; the bounded ROWS frame keeps per-row state at 7 "
        "entries regardless of partition size."
    ),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        ((F.sum(fixed_point("o_totalprice")).over(w) / 100) / F.count("*").over(w)).alias(
            "moving_avg_price"
        ),
        F.count("*").over(w).alias("n_in_window"),
    )
