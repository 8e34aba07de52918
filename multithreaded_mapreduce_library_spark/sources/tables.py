"""Parquet sources for the fixture tables (TESTDATA.md / FIXTURES.md).

The reference's only source is one-file-per-map-task text input
(`mapreduce.c:173-175`, `distwc.c:8-13`); Spark's parquet reader subsumes it
(splittable files, column pruning, predicate pushdown). The reference-native
text-file path is provided by :mod:`..mapreduce` for the facade.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions that are broadcast-sized at every scale factor (≪ the 64MB
# autoBroadcastJoinThreshold even at 100 TB-scale fact tables — they scale
# sub-linearly in TPC-H-style schemas).
BROADCAST_DIMS = ("region", "nation", "supplier")


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
        # parquet reader rejects by default; read nanos as long and convert
        # (integer `div` keeps full precision — ns since epoch exceeds 2^53,
        # so float division would corrupt timestamps).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
