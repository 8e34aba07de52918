"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's central registry
(``multithreaded_mapreduce_library_spark.registry``): every operator from
SURVEY.md §2 registers a PySpark builder and (where SQL-expressible) its
DuckDB oracle side-by-side, so ``queries()`` and ``oracle_sql()`` stay in
lockstep by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from multithreaded_mapreduce_library_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Reference-fidelity word count (distwc.c:7-34) over documents.text.
    """
    specs = load_all()
    return specs["wordcount"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query in queries()."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
