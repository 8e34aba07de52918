"""Text operators over the ``documents`` table.

Flagship: the reference-fidelity word count — the exact computation of the
reference's example application (distwc.c:7-34): whitespace tokenization
(`strsep` on " \\t\\n\\r", distwc.c:14), empty-token drop (mapreduce.c:205-207),
per-word count (distwc.c:23-34). Spark-first shape: explode+split+filter+
groupBy/count — Catalyst prunes the scan to the ``text`` column and the
count aggregate gets map-side partial aggregation (the combiner the
reference lacks, SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.functions import duck_tokens, tokens
from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table

WORDCOUNT_ORACLE = f"""
SELECT word, count(*) AS cnt
FROM (SELECT unnest({duck_tokens('text')}) AS word FROM documents)
GROUP BY word
"""


@register(
    "wordcount",
    oracle=WORDCOUNT_ORACLE,
    tags=("text", "flagship", "reference-fidelity"),
    doc="distwc.c word count: whitespace tokens, empty tokens dropped, count per word",
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
