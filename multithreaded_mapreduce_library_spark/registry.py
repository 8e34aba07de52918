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
    # --- round-6 rotated 50-query gate prefix ---------------------------
    # The driver verifies a 50-query PREFIX of this order. Steady-state
    # ROTATION RULE (every gated query has >=1 green driver row, so the
    # invariant is bounded staleness, not first coverage): each round the
    # prefix is
    #   (1) every query that is NEW or whose builder/oracle text or
    #       semantics changed this round (must be driver-(re)verified),
    #   (2) the least-recently-verified remainder — fill to 50 from the
    #       oldest last-green CORRECTNESS_r*.json round, alphabetical
    #       within a round.
    # Capacity arithmetic (r6): 150 gated queries, 50 slots. Changed set
    # is 13 — multimodal_decode (MP4 metadata rows + oracle rewrite),
    # embedding_quantize + sim_topk_quantized (oracle min/max hoist),
    # ivf_train_centroids + sim_topk_ivf_trained (multi-round Lloyd
    # refactor of the shared helper), and all 8 stream_* queries (builder
    # bodies extracted into shared *_transform functions for the
    # multi-batch replay suite; semantics unchanged, but changed text =>
    # re-verify). That leaves 37 backlog slots: all 24 r2-stale queries
    # (the round-5 schedule, honored) + the 13 alphabetically-first
    # r3-stale; the remaining 17 r3-stale wait one round and MUST lead
    # the r7 prefix. Worst-case recycle stays within the pinned
    # FOUR-round staleness bound
    # (tests/test_registry_oracle.py::test_gate_prefix_bounds_staleness);
    # in steady state (small changed sets) the effective bound is 3.
    # Do not pad with trivial variants; a new flagship must displace a
    # verified one.
    # (1) new/changed in r6 (13):
    "multimodal_decode", "embedding_quantize", "sim_topk_quantized",
    "ivf_train_centroids", "sim_topk_ivf_trained", "stream_tumbling",
    "stream_sliding_watermark", "stream_dedup", "stream_session",
    "stream_stateful_running_max", "stream_funnel", "stream_stream_join",
    "stream_static_join",
    # (2) last green in r2 (24 — the oldest, the full r2 cohort):
    "join_asof", "join_broadcast", "join_large", "join_left", "join_range",
    "join_semi", "join_skew_salted", "lang_id", "map_in_arrow_project",
    "mr_inverted_index", "multimodal_frame_sample", "quality_score",
    "sample_stratified", "sequence_packing", "sessionize", "sim_lsh_buckets",
    "sim_near_dup", "sim_topk_bruteforce", "time_tumbling", "token_stats",
    "udtf_tokenize", "window_range_frame", "window_rank", "window_running",
    # (2) last green in r3, oldest 13 alphabetically (the 17 remaining
    # r3-stale queries head the rotated-out list and lead the r7 prefix):
    "cogroup_reconcile", "corpus_curation", "corr_stats",
    "correlated_subquery", "dist_moments", "event_funnel", "group_cube",
    "grouping_sets", "join_full", "join_right", "join_shuffle_hash",
    "join_theta", "market_share",
    # --- end of gate prefix (50) ----------------------------------------
    # rotated out, most-stale first: r3 leftovers (17), then r4-green
    # (44), then r5-green (39):
    "percentiles", "pivot_status", "product_profit", "scalar_array",
    "scalar_date", "scalar_map", "scalar_math", "setop_except",
    "setop_except_all", "setop_intersect", "setop_intersect_all",
    "shipping_priority", "variance_stats", "waiting_orders",
    "window_lag_lead", "window_ntile", "window_share",
    "customer_distribution", "dedup_apply", "dedup_keep_list",
    "dedup_minhash", "disjunctive_revenue", "dormant_customers",
    "excess_shipments", "forecast_revenue", "group_rollup",
    "hypertable_rollup", "important_parts", "join_bucketed", "join_cross",
    "json_extract", "large_volume_customers", "local_supplier_volume",
    "map_in_pandas_filter", "min_cost_supplier", "mr_wordcount",
    "order_priority_check", "pandas_udaf_grouped", "pandas_udf_scalar",
    "parts_supplier_cnt", "pricing_summary", "priority_shipping",
    "promo_revenue_share", "returned_items", "scalar_string", "scd2_merge",
    "setop_union", "sim_topk_ivf", "sim_topk_multiprobe", "small_qty_revenue",
    "sql_interface", "tf_idf", "time_sliding", "top_supplier",
    "variant_extract", "volume_shipping", "window_distribution",
    "window_first_last", "window_moving_avg", "window_topk_per_group",
    "wordcount",
    "repetition_ngram", "pii_redact", "join_asof_window",
    "quarantine_malformed", "contamination_check", "dedup_ngram_jaccard",
    "multimodal_metadata", "multimodal_features", "multimodal_resize",
    "agg_argmax", "agg_bool", "agg_listagg", "agg_mode", "agg_salted_skew",
    "agg_stats", "calendar_fill", "case_when", "conditional_agg",
    "count_distinct", "distinct_rows", "filter_project", "having_filter",
    "lateral_posexplode", "multi_count_distinct", "orderby_limit",
    "sample_hash", "scalar_subquery", "unpivot_measures", "bm25_search",
    "dataset_split", "dedup_clusters", "dedup_exact", "dedup_fuzzy_names",
    "dedup_keep_first", "dedup_simhash", "doc_fingerprint",
    "embedding_centroids", "grouped_map_zscore", "join_anti",
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
