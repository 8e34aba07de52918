"""Registry entries exercising the MapReduce facade end-to-end.

``mr_wordcount`` reproduces the reference's example application
(distwc.c:36-38: 5 workers, 10 partitions) over documents.text and shares
the flagship word-count oracle — proving the facade computes exactly what
the DataFrame path computes (and what distwc.c computed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multithreaded_mapreduce_library_spark.mapreduce import mr_wordcount_df
from multithreaded_mapreduce_library_spark.operators.text import WORDCOUNT_ORACLE
from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table


@register(
    "mr_wordcount",
    oracle=WORDCOUNT_ORACLE,
    tags=("mapreduce-facade", "reference-fidelity"),
    doc="distwc.c word count through the RDD facade (djb2 partitioning, 10 partitions)",
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select("text").rdd.map(lambda r: r[0])
    return mr_wordcount_df(spark, lines, num_partitions=10)
