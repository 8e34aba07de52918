"""Parquet sources for the fixture tables (TESTDATA.md / FIXTURES.md).

The reference's only source is one-file-per-map-task text input
(`mapreduce.c:173-175`, `distwc.c:8-13`); Spark's parquet reader subsumes it
(splittable files, column pruning, predicate pushdown). The reference-native
text-file path is provided by :mod:`..mapreduce` for the facade.
"""

from __future__ import annotations

import hashlib
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
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(table_path(sf_dir, name)))
    return spark.read.parquet(table_path(sf_dir, name))


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to session-tz TIMESTAMP from either physical
    layout the fixture generator has shipped — the ONE place both the
    batch loader and the streaming source get this logic from.

    Layouts seen so far: INT64 TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default (read nanos as long via the nanosAsLong
    conf; integer `div` keeps full precision — ns since epoch exceeds
    2^53, so float division would corrupt timestamps), and plain
    timestamp[us], which arrives as TIMESTAMP_NTZ (cast to session-tz
    TIMESTAMP — value-preserving under the UTC session, and keeps every
    downstream query on one timestamp class).
    """
    from pyspark.sql import functions as F

    if dict(df.dtypes)["ts"] == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def rebalance_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Spread a narrow scan across the cluster before CPU-heavy map work.

    Parquet's split unit is the row group; a file with one giant row group
    (our fixtures — and any badly-written upstream file at 100 TB) scans as
    ONE task, serializing everything narrow that follows (tokenize, md5,
    shingle explode, per-pair folds). When the scan's parallelism is below
    the cluster's, insert one round-robin exchange of the *source* rows —
    cheap relative to the downstream compute it parallelizes. When the
    source is already well-split (the normal many-files case at scale),
    this is a no-op with zero plan change.

    Only worth it when downstream per-row work dominates the exchange cost;
    plain filter/agg paths should NOT use this (the exchange would defeat
    scan-adjacent partial aggregation for no compute win).
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# Bucket count for co-located joins. Locally tiny; on a cluster this would
# be sized so each bucket is a few hundred MB at the target SF (e.g. 4096
# buckets for a 1 TB fact table).
N_BUCKETS = 8


def bucketed_table(spark: SparkSession, sf_dir: str, name: str, key: str) -> DataFrame:
    """Load ``name`` as a parquet table bucketed (and sorted) on ``key``,
    writing it to the session warehouse on first use (cached per sf_dir).

    Bucketing is the on-disk pre-shuffle: both sides of a join bucketed on
    the join key with the same bucket count satisfy the join's required
    distribution straight off the scan, so the exchange (and with one file
    per bucket, the sort) disappears from the plan. At 100 TB this is the
    difference between re-shuffling the fact table on every join and
    shuffling it once at ingest — the standard layout for a fact table
    joined repeatedly on the same key.

    The ``repartition(N_BUCKETS, key)`` before the write makes each task
    hold exactly one bucket, yielding one file per bucket — the layout
    Spark requires to trust the per-bucket sort order.
    """
    from pyspark.sql import functions as F

    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = f"bkt_{name}_{suffix}"
    if not spark.catalog.tableExists(tbl):
        # The warehouse dir outlives the in-memory catalog: a leftover
        # location from a previous session makes saveAsTable fail with
        # LOCATION_ALREADY_EXISTS even in overwrite mode. Clear it.
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        leftover = os.path.join(warehouse, tbl)
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
        df = load_table(spark, sf_dir, name)
        (
            df.repartition(N_BUCKETS, F.col(key))
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tbl)
        )
    return spark.table(tbl)
