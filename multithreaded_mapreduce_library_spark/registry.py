"""Central query/operator registry.

Every operator in SURVEY.md §2 is registered here as a named pair:
a PySpark builder ``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible)
the equivalent DuckDB oracle SQL over the same parquet tables. The driver
contract (``__spark_entry__.py``) and the local test suite both consume this
registry, so a query is "done" exactly when it is registered and oracle-green.

Conventions that make the order-insensitive value-hash comparison exact:
- alias every computed column identically in Spark and SQL;
- aggregate money through fixed-point integers (functions.fixed_point:
  floor(x*scale+0.5) — order-independent exact sums, ~5× faster than
  DECIMAL aggregation), divided back to DOUBLE at the end;
- emit timestamps as formatted strings (or DATE), never raw timestamps;
- round genuinely float-path outputs (e.g. cosine) and break ranking ties on
  a unique key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}

# Modules whose import populates QUERIES.
_OPERATOR_MODULES = (
    "multithreaded_mapreduce_library_spark.operators.text",
    "multithreaded_mapreduce_library_spark.operators.relational",
    "multithreaded_mapreduce_library_spark.operators.joins",
    "multithreaded_mapreduce_library_spark.operators.windows",
    "multithreaded_mapreduce_library_spark.operators.events",
    "multithreaded_mapreduce_library_spark.operators.dedup",
    "multithreaded_mapreduce_library_spark.operators.similarity",
    "multithreaded_mapreduce_library_spark.operators.multimodal",
    "multithreaded_mapreduce_library_spark.operators.udfs",
    "multithreaded_mapreduce_library_spark.operators.approx",
    "multithreaded_mapreduce_library_spark.operators.tpch_shapes",
    "multithreaded_mapreduce_library_spark.operators.tpch_more",
    "multithreaded_mapreduce_library_spark.operators.mapreduce_queries",
    "multithreaded_mapreduce_library_spark.operators.pipeline",
    "multithreaded_mapreduce_library_spark.streaming.queries",
)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tuple(tags), doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


# Presentation order for the driver contract: a cross-family prefix first
# (reference fidelity, text/LLM pipeline, dedup, similarity, multimodal,
# joins, windows, event-time, core relational, UDF surfaces), so any
# prefix-bounded external check exercises every operator family rather
# than only the first modules imported. Contains no names not registered
# elsewhere; everything unlisted follows in registration order.
_PRIORITY = (
    # --- round-4 rotated 50-query gate prefix ---------------------------
    # The driver verifies a 50-query PREFIX of this order. Composition:
    # 17 sentinels that went green in the r3 gate (one per operator
    # family, so a regression in shared machinery — sources, functions,
    # shingles, canon — still surfaces), then the 3 queries whose
    # text/oracle changed in r4 (multimodal_features: histogram exploded
    # to scalar rows; dedup_ngram_jaccard + contamination_check: shingle
    # df-cutoff and the VAL_CUT split alignment), then the 30 remaining
    # oracle-gated queries that have never had a driver-verified row.
    # 17 + 3 + 30 = 50: a green r4 gate means EVERY oracle-gated query in
    # the repo has been driver-verified at least once. Do not pad with
    # trivial variants; a new flagship must displace a verified one.
    # r3-verified sentinels (one per family):
    "wordcount", "mr_wordcount",                       # reference fidelity
    "tf_idf",                                          # text/LLM analysis
    "dedup_minhash",                                   # dedup (LSH path)
    "sim_topk_ivf",                                    # similarity (scale path)
    "multimodal_metadata",                             # multimodal
    "join_bucketed",                                   # joins (zero-exchange)
    "window_topk_per_group",                           # windows
    "hypertable_rollup",                               # event-time batch
    "pricing_summary",                                 # core relational agg
    "pandas_udaf_grouped",                             # UDF surface
    "sql_interface",                                   # SQL text interface
    "group_rollup",                                    # grouping sets/cube
    "setop_union",                                     # set operations
    "scalar_string",                                   # scalar functions
    "variant_extract",                                 # json/variant
    "scd2_merge",                                      # subqueries/SCD2
    # changed in r4 — must be driver-re-verified:
    "multimodal_features", "dedup_ngram_jaccard", "contamination_check",
    # never-driver-verified before this round (30 — the full remainder):
    "json_extract", "join_cross", "local_supplier_volume",
    "window_first_last", "window_distribution", "window_moving_avg",
    "time_sliding", "dedup_keep_list", "dedup_apply", "sim_topk_multiprobe",
    "pandas_udf_scalar", "map_in_pandas_filter",
    "order_priority_check", "forecast_revenue", "returned_items",
    "promo_revenue_share", "large_volume_customers", "min_cost_supplier",
    "volume_shipping", "important_parts", "priority_shipping",
    "customer_distribution", "top_supplier", "parts_supplier_cnt",
    "small_qty_revenue", "disjunctive_revenue", "excess_shipments",
    "dormant_customers", "stream_stream_join", "stream_static_join",
    # --- end of gate prefix (50) ----------------------------------------
    # driver-verified queries rotated out of the prefix (r3 batch first,
    # then the r1/r2 batch), kept next in presentation order:
    "grouping_sets", "group_cube", "pivot_status", "percentiles",
    "correlated_subquery",
    "shipping_priority", "product_profit", "waiting_orders", "market_share",
    "setop_intersect", "setop_except", "setop_intersect_all",
    "setop_except_all",
    "scalar_math", "scalar_date", "scalar_array", "scalar_map",
    "window_lag_lead", "window_ntile", "window_share",
    "join_theta", "join_right", "join_full", "join_shuffle_hash",
    "dist_moments", "corr_stats", "variance_stats",
    "corpus_curation", "cogroup_reconcile", "event_funnel",
    "mr_inverted_index", "token_stats", "quality_score", "lang_id",
    "doc_fingerprint", "bm25_search",
    "dedup_exact", "dedup_keep_first", "dedup_simhash",
    "dedup_fuzzy_names", "dedup_clusters",
    "sim_topk_bruteforce", "sim_lsh_buckets", "sim_near_dup",
    "embedding_centroids",
    "multimodal_frame_sample", "multimodal_resize",
    "join_broadcast", "join_large", "join_left", "join_semi", "join_anti",
    "join_range", "join_asof", "join_skew_salted",
    "window_rank", "window_running", "window_range_frame",
    "time_tumbling", "sessionize",
    "dataset_split", "sample_stratified", "sequence_packing",
    "grouped_map_zscore", "map_in_arrow_project", "udtf_tokenize",
)


def load_all() -> dict[str, QuerySpec]:
    """Import all operator modules (idempotent) and return the registry,
    priority names first (see _PRIORITY)."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    # A mistyped/renamed _PRIORITY entry must fail loudly: silently
    # skipping it would shift every later query's position and change
    # which queries the prefix-bounded driver gate verifies.
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    return ordered
