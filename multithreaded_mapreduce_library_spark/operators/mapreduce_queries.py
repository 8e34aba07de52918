"""Registry entries exercising the MapReduce facade end-to-end.

``mr_wordcount`` reproduces the reference's example application
(distwc.c:36-38: 5 workers, 10 partitions) over documents.text and shares
the flagship word-count oracle — proving the facade computes exactly what
the DataFrame path computes (and what distwc.c computed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multithreaded_mapreduce_library_spark.mapreduce import mr_wordcount_df
from multithreaded_mapreduce_library_spark.functions import duck_tokens
from multithreaded_mapreduce_library_spark.operators.text import WORDCOUNT_ORACLE

_duck_tokens_expr = duck_tokens('text')
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


@register(
    "mr_inverted_index",
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({_duck_tokens_expr}) AS word FROM documents
)
SELECT word, count(*) AS n_docs, min(doc_id) AS first_doc
FROM tok GROUP BY word
""",
    tags=("mapreduce-facade",),
    doc=(
        "Inverted index through the facade: mapper emits (token, doc_id) "
        "per distinct token of a doc, reducer folds the posting bag into "
        "(doc-frequency, first posting) — a non-counting Reducer exercising "
        "the same MR semantics as distwc with a different fold."
    ),
)
def mr_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from multithreaded_mapreduce_library_spark.mapreduce import mr_run

    docs = load_table(spark, sf_dir, "documents")
    rdd = docs.select("doc_id", "text").rdd.map(lambda r: (r[0], r[1]))

    def mapper(rec):
        doc_id, text = rec
        toks = {
            t
            for t in text.replace("\t", " ").replace("\n", " ").replace("\r", " ").split(" ")
            if t
        }
        for t in toks:
            yield t, str(doc_id)

    def reducer(word, doc_ids):
        ids = [int(d) for d in doc_ids]
        yield word, len(ids), min(ids)

    out = mr_run(spark, rdd, mapper, reducer, num_partitions=10)
    return spark.createDataFrame(out, schema="word string, n_docs long, first_doc long")
