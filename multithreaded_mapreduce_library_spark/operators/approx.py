"""Approximate aggregates — the 100 TB path for distinct counts and
percentiles (HyperLogLog++ and quantile sketches are mergeable, so they
partial-aggregate map-side and never materialize per-key state).

Sketch outputs are engine-specific by nature (DuckDB's approx functions
use different sketch parameters), so these are rows-only contract entries;
the pytest suite bounds them against the exact operators instead
(relative-error assertions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table


@register(
    "approx_count_distinct",
    oracle=None,  # sketch parameters differ per engine — bounded vs exact in tests
    tags=("approx", "aggregation", "distinct"),
    doc=(
        "HyperLogLog++ distinct customers per order status (rsd=0.5%). "
        "Constant-size mergeable state vs the exact expand+two-phase plan — "
        "the only viable distinct-count at 100 TB cardinalities."
    ),
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.005).alias("approx_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "approx_percentiles",
    oracle=None,  # sketch-based — bounded vs exact percentiles in tests
    tags=("approx", "aggregation", "percentile"),
    doc=(
        "approx_percentile with accuracy=10000: mergeable quantile sketch "
        "(no per-group sort). The scale replacement for the exact "
        "`percentiles` operator."
    ),
)
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pcts = F.expr(
        "approx_percentile(o_totalprice, array(0.25, 0.5, 0.9), 10000)"
    )
    return o.groupBy("o_orderpriority").agg(
        pcts.getItem(0).alias("p25"),
        pcts.getItem(1).alias("p50"),
        pcts.getItem(2).alias("p90"),
        F.count("*").alias("n"),
    )
