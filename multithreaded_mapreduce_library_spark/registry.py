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


def load_all() -> dict[str, QuerySpec]:
    """Import all operator modules (idempotent) and return the registry."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return QUERIES
