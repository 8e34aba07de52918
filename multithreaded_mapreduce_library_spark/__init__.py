"""PySpark-native analytics engine with the capabilities of the reference
multithreaded MapReduce library (see SURVEY.md), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, tuned shuffle parallelism)
- ``sources``    : parquet table loaders for the fixture star schema
- ``mapreduce``  : RDD-backed facade mirroring the reference MR_Run API semantics
- ``operators``  : the query/operator inventory (relational, windows, time,
                   dedup, similarity, text) — each registered with a DuckDB
                   oracle in ``registry``
- ``streaming``  : Structured Streaming operators over the events table
- ``functions``  : cross-engine (Spark + DuckDB) expression helpers
- ``plans``      : physical-plan audit helpers (pushdown / broadcast checks)
"""

__version__ = "0.1.0"

from multithreaded_mapreduce_library_spark.mapreduce import (  # noqa: F401
    djb2,
    mr_partitioner,
    mr_run,
)
from multithreaded_mapreduce_library_spark.registry import QUERIES, load_all  # noqa: F401
from multithreaded_mapreduce_library_spark.session import get_spark  # noqa: F401
from multithreaded_mapreduce_library_spark.sources import (  # noqa: F401
    load_table,
    register_views,
)
