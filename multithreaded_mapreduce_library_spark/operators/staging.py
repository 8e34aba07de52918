"""STAGED (unregistered) flagship candidates — r17 landing queue.

This module is deliberately NOT in registry._OPERATOR_MODULES: importing
it registers nothing, so the driver-gated surface is untouched. It exists
so a new flagship can land the way the r15 Lloyd seeds-CTE alignment did
(r14 verdict item: "pre-staged with a validated oracle ... default-off or
unregistered prototype first"): builder + oracle written and
oracle-validated one round, registered + prefix-rotated the next.

Staged in r16, to land in r17 (changed-set cap 5 per the _PRIORITY
forecast; this is ONE name):

lm_bigram_score — corpus-trained bigram language-model predictability
scoring, the perplexity-filter quality signal of CCNet/Gopher-style
training-data pipelines re-expressed without transcendentals so the
oracle hash can be exact. For every document with >= 2 whitespace tokens
(the reference tokenizer: distwc.c:7-21 split + empty drop, shared with
wordcount), score = mean over its bigrams of the add-1-smoothed
conditional probability

    P(w2 | w1) = (c(w1, w2) + 1) / (c_ctx(w1) + V)

where c(w1, w2) is the corpus bigram count, c_ctx(w1) the corpus count
of w1 as a bigram CONTEXT (i.e. occurrences not in document-final
position), and V the whole-corpus distinct-unigram vocabulary (computed
over ALL tokens, including 1-token documents, on both engines). Low
scores mark documents whose word transitions the corpus LM finds
surprising — the standard perplexity-filter signal, monotone-inverted
(high avg probability = low perplexity).

Exactness: every per-bigram probability is one IEEE double division of
exact integers (both < 2^53), and IEEE division/multiplication/addition
are correctly rounded on both engines, so floor(p * 1000000 + 0.5) is
bit-identical; the per-document mean then rides the repo's fixed-point
convention (integer sum -> one correctly-rounded double division). No
log/exp anywhere — Java's Math.log and C++'s std::log are only ~1-ulp
accurate and could flip a fixed-point rounding at the boundary, which is
why the score is mean probability rather than mean log-probability.

Shuffle story (100 TB): tokenize + bigram explode are narrow; corpus
model = TWO keyed aggregation exchanges (bigram counts on (w1, w2),
context counts on w1) with map-side partial aggregation; scoring = two
keyed joins of the bigram stream against those model tables (shuffle on
(w1, w2) then w1 — model tables are vocab-sized, so AQE broadcasts them
when small and shuffles when not; no all-pairs anywhere); V is a 1-row
broadcast. Final per-document mean is ONE agg exchange on doc_id. Skew
note: stopword contexts ("the", ...) make c1/c2 hot keys — both are
PRE-AGGREGATED before the join, so the hot key carries one row per
distinct bigram, not one per occurrence; the occurrence-side join fans
out per document partition, which AQE skew-join splits if needed.

Validation (tests/test_staging.py): oracle-differential green on the
checked-in sf0.001 fixture AND a freshly generated seed-99 fixture (the
forcing test — a constant calibrated to one corpus distribution fails
there), plus plan-shape pins (no cartesian on the data path, broadcast
1-row V). r17 landing step: move the @register-able pair into
operators/text.py (or keep the module and add it to _OPERATOR_MODULES),
register with this exact oracle, then scripts/rotate_prefix.py --apply
lm_bigram_score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.functions import duck_tokens, tokens
from multithreaded_mapreduce_library_spark.registry import QuerySpec
from multithreaded_mapreduce_library_spark.sources import load_table

LM_BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {duck_tokens('text')} AS t FROM documents
),
bg AS (
  SELECT doc_id, bgs.w1 AS w1, bgs.w2 AS w2 FROM (
    SELECT doc_id, unnest(list_transform(range(2, len(t) + 1),
                          i -> {{'w1': t[i-1], 'w2': t[i]}})) AS bgs
    FROM toks WHERE len(t) >= 2
  )
),
c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab
      FROM (SELECT unnest(t) AS w FROM toks))
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       floor(CAST(CAST(sum(CAST(floor(
           (c2.c12 + 1) / CAST(c1.c1 + v.vocab AS DOUBLE) * 1000000 + 0.5
         ) AS BIGINT)) AS BIGINT) AS DOUBLE) / count(*) + 0.5) / 1000000
         AS avg_bigram_p
FROM bg b
JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
JOIN c1 ON b.w1 = c1.w1
CROSS JOIN v
GROUP BY b.doc_id
"""


def lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See the module docstring; builder twin of LM_BIGRAM_ORACLE."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("t"))
    # vocabulary over ALL tokens (1-token docs included), matching the
    # oracle's v CTE — computed BEFORE the >=2-token bigram filter
    v = toks.select(F.explode("t").alias("w")).agg(
        F.count_distinct("w").alias("vocab")
    )
    bg = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("bgs"),
        )
        .select("doc_id", "bgs.w1", "bgs.w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    p = (F.col("c12") + F.lit(1)) / (F.col("c1") + F.col("vocab")).cast("double")
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(v))
        .withColumn("p_fx", F.floor(p * F.lit(1000000) + F.lit(0.5)).cast("long"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (
            F.floor(
                F.sum("p_fx").cast("double") / F.count("*") + F.lit(0.5)
            ) / F.lit(1000000)
        ).alias("avg_bigram_p"),
    )


def staged_specs() -> dict[str, QuerySpec]:
    """The staged (NOT registered) specs, in the registry's own shape so
    tests/oracle.py::compare_query can validate them verbatim."""
    return {
        "lm_bigram_score": QuerySpec(
            name="lm_bigram_score",
            builder=lm_bigram_score,
            oracle=LM_BIGRAM_ORACLE,
            tags=("text", "llm-pipeline", "quality", "staged-r17"),
            doc=__doc__,
        )
    }
