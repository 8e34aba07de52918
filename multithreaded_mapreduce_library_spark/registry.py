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
    # --- round-3 rotated 50-query gate prefix ---------------------------
    # The driver verifies a 50-query PREFIX of this order. Round 2 verified
    # the previous prefix (see CORRECTNESS_r02.json); this round keeps one
    # sentinel per family from that set, keeps the four queries whose
    # text/oracle changed in r3 (sql_interface, dedup_ngram_jaccard,
    # contamination_check, multimodal_features), and fills the remaining
    # slots with queries that have never had a driver-verified row — the
    # point is converting self-reported correctness into driver-verified
    # correctness for the long tail, not re-proving r2 wins. Do not pad
    # with trivial variants; a new flagship must displace a verified one.
    # r2-verified sentinels (one per family):
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
    # changed in r3 — must be driver-re-verified:
    "sql_interface", "dedup_ngram_jaccard", "contamination_check",
    "multimodal_features",
    # never-driver-verified until now (36 inside the 50-prefix;
    # json_extract lands at position 51, first in line for the r4 rotation):
    "group_rollup", "grouping_sets", "group_cube", "pivot_status",
    "percentiles", "correlated_subquery", "scd2_merge",
    "shipping_priority", "product_profit", "waiting_orders", "market_share",
    "setop_union", "setop_intersect", "setop_except",
    "setop_intersect_all", "setop_except_all",
    "scalar_string", "scalar_math", "scalar_date", "scalar_array",
    "scalar_map",
    "window_lag_lead", "window_ntile", "window_share",
    "join_theta", "join_right", "join_full", "join_shuffle_hash",
    "dist_moments", "corr_stats", "variance_stats",
    "corpus_curation", "cogroup_reconcile", "event_funnel",
    "variant_extract", "json_extract",
    # --- end of gate prefix (50) ----------------------------------------
    # r2-driver-verified queries rotated out of the prefix, kept next in
    # presentation order:
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
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    return ordered
