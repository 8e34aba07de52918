"""STAGED (unregistered) flagship candidates — the landing queue.

This module is deliberately NOT in registry._OPERATOR_MODULES: importing
it registers nothing, so the driver-gated surface is untouched. It exists
so a new flagship can land the way the r15 Lloyd seeds-CTE alignment and
the r17 ``lm_bigram_score`` did (r15 verdict: "pre-staged with a
validated oracle ... default-off or unregistered prototype first"):
builder + oracle written and oracle-validated one round, registered +
prefix-rotated the next.

Protocol (tests/test_staging.py enforces the evidence automatically for
anything returned by ``staged_specs()``):
- builder + oracle in the registry's own ``QuerySpec`` shape;
- oracle differential green on the checked-in seed-42 fixture AND on a
  freshly generated different-seed fixture (the forcing test; pick a
  seed outside scripts/gen_fixture.py::BURNED_SEEDS — the canonical
  registry — and record it there in the same commit);
- a hand-checked known-values micro-corpus test and plan-shape pins,
  added per-query alongside the staged spec;
- landing = move the pair under ``@register`` in its operator module,
  ``scripts/rotate_prefix.py --apply <name>...``, migrate the per-query
  tests to the registered spec, and empty this queue.

History: ``lm_bigram_score`` staged r16 here, landed r17 in
operators/text.py (its micro-corpus + plan pins moved to
tests/test_text_lm.py).

Staged in r17, to land in r18 (changed-set cap 4 per the _PRIORITY
forecast; THREE primary names + ONE optional — land the optional
`stream_lm_score` only if no r17 gate query needs the slot for a
re-fix; a red query's re-verification always outranks a new landing):

doc_ngram_novelty — per-document cross-corpus trigram novelty: the
fraction of a document's DISTINCT word trigrams that appear in no other
document. The boilerplate/memorization diversity signal of training-data
curation (a low-novelty doc is assembled from phrases the corpus already
has; a high-novelty doc contributes new text). Exact integer counting
end-to-end; the one division rides the fixed-point convention. Lands in
operators/text.py.

source_divergence — per-source total-variation distance between the
source's unigram distribution and the whole-corpus distribution:
TV(p_s, q) = 0.5 * sum_w |p_s(w) - q(w)|. The mixture-design /
distribution-shift signal (which sources differ most from the corpus
they're blended into — DoReMi-style reweighting starts from exactly this
table). No transcendentals (deliberately TV, not KL: KL needs log, whose
last-ulp differs across engines); each term is correctly-rounded IEEE
divisions/subtractions of exact integers, fixed-pointed per term and
integer-summed. Absent-word terms (w in corpus, not in s: |0 - q(w)| =
q(w)) are handled WITHOUT materializing source x vocab: sum over absent
= qsum_fx - qs_fx with the identical per-term fx formula on both
engines. Lands in operators/text.py.

embedding_outliers — per-cell far-from-centroid ranking over the shared
Lloyd cells (_DUCK_LLOYD_CTES, K_CELLS=8, 1 refinement — the exact same
trained cells as the IVF family): top-5 vectors by squared-L2 distance
DESC per cell (vec_id tiebreak). The SemDeDup-style embedding-space
pruning signal: cluster outliers are the noise/off-distribution
candidates a curation pass drops first. d2 is the bit-identical
sequential fold, so ranking and the 1e-6-floored d2_r are exact. Lands
in operators/similarity.py.

stream_lm_score (OPTIONAL 4th) — the online half of lm_bigram_score:
bigram model trained on the CORPUS split (h31 % INC_SPLIT_MOD, the
incremental-family convention), held static; arriving batch-split
documents stream in and are scored per micro-batch via stream-static
LEFT joins (unseen transitions fall back to the add-1 floor 1/V — the
deployed perplexity-filter semantics, where the model is frozen at
serving time and V covers corpus vocabulary only). Lands in
streaming/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.functions import duck_tokens, tokens
from multithreaded_mapreduce_library_spark.registry import QuerySpec
from multithreaded_mapreduce_library_spark.sources import load_table

# --- doc_ngram_novelty ------------------------------------------------------

DOC_NGRAM_NOVELTY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {duck_tokens('text')} AS t FROM documents
),
tri AS (
  SELECT DISTINCT doc_id, tg.w1 AS w1, tg.w2 AS w2, tg.w3 AS w3 FROM (
    SELECT doc_id, unnest(list_transform(range(3, len(t) + 1),
                          i -> {{'w1': t[i-2], 'w2': t[i-1], 'w3': t[i]}})) AS tg
    FROM toks WHERE len(t) >= 3
  )
),
df AS (
  SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS df
  FROM tri GROUP BY w1, w2, w3
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       floor(CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 1000000 + 0.5) / 1000000 AS novel_frac
FROM tri t
JOIN df d ON t.w1 = d.w1 AND t.w2 = d.w2 AND t.w3 = d.w3
GROUP BY t.doc_id
"""


def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle story (100 TB): trigram explode is narrow; per-doc
    DISTINCT is one exchange on (doc_id, trigram); the df table is ONE
    keyed re-agg of that distinct set (map-side partials — the hot
    boilerplate trigram carries one row per distinct doc, already
    deduped); the df join is keyed on the trigram (AQE broadcasts when
    the df table is small, shuffles when vocab-scale); the final mean is
    one agg exchange on doc_id. No all-pairs anywhere — novelty needs
    only per-trigram document frequency, never doc x doc comparison."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("t"))
    tri = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2),"
                    " i -> struct(element_at(t, i) AS w1,"
                    " element_at(t, i + 1) AS w2,"
                    " element_at(t, i + 2) AS w3))"
                )
            ).alias("tg"),
        )
        .select("doc_id", "tg.w1", "tg.w2", "tg.w3")
        .distinct()
    )
    df = tri.groupBy("w1", "w2", "w3").agg(F.count("*").alias("df"))
    novel = F.sum(
        F.when(F.col("df") == 1, F.lit(1)).otherwise(F.lit(0)).cast("long")
    )
    agg = (
        tri.join(df, ["w1", "w2", "w3"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_trigrams"), novel.alias("n_novel"))
    )
    return agg.select(
        "doc_id",
        "n_trigrams",
        "n_novel",
        (
            F.floor(
                F.col("n_novel").cast("double") / F.col("n_trigrams")
                * F.lit(1000000) + F.lit(0.5)
            ) / F.lit(1000000)
        ).alias("novel_frac"),
    )


# --- source_divergence ------------------------------------------------------

# fx(x) must be the IDENTICAL formula everywhere it appears (present
# terms, qs_fx, qsum_fx) so the absent-word algebra cancels exactly.
_SD_FX = 1_000_000

SOURCE_DIVERGENCE_ORACLE = f"""
WITH tok AS (
  SELECT source, w FROM (
    SELECT source, unnest({duck_tokens('text')}) AS w
    FROM documents WHERE source IS NOT NULL
  ) WHERE w IS NOT NULL
),
sw AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY source, w
),
stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM sw GROUP BY source),
wc AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM sw GROUP BY w),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sw),
qfx AS (
  SELECT CAST(sum(CAST(floor(CAST(cw AS DOUBLE) / n * {_SD_FX} + 0.5)
                       AS BIGINT)) AS BIGINT) AS qsum_fx
  FROM wc CROSS JOIN tot
),
per AS (
  SELECT s.source,
         CAST(sum(CAST(floor(abs(CAST(s.c AS DOUBLE) / t.ns
                                 - CAST(w.cw AS DOUBLE) / o.n)
                             * {_SD_FX} + 0.5) AS BIGINT)) AS BIGINT)
           AS present_fx,
         CAST(sum(CAST(floor(CAST(w.cw AS DOUBLE) / o.n * {_SD_FX} + 0.5)
                       AS BIGINT)) AS BIGINT) AS qs_fx
  FROM sw s
  JOIN stot t ON s.source = t.source
  JOIN wc w ON s.w = w.w
  CROSS JOIN tot o
  GROUP BY s.source
)
SELECT p.source, t.ns AS n_tokens,
       CAST(p.present_fx + (q.qsum_fx - p.qs_fx) AS DOUBLE) / {2 * _SD_FX}
         AS tv_distance
FROM per p
JOIN stot t ON p.source = t.source
CROSS JOIN qfx q
"""


def source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle story (100 TB): token explode narrow; ONE keyed agg
    exchange on (source, w); stot / wc / tot are RE-AGGREGATIONS of that
    pre-aggregated table (map-side partials, never a second pass over
    raw tokens); the scoring join is keyed on w against the vocab-sized
    wc (AQE broadcasts when small) plus a handful-of-rows stot join and
    two 1-row broadcasts (tot, qsum). Skew: stopword rows are already
    collapsed to one row per (source, w) before any join. Output is one
    row per source."""
    d = load_table(spark, sf_dir, "documents")
    # The not-null filter is semantically a no-op on real data (tokens
    # are non-null by construction; a null source would be excluded by
    # the inner joins below on BOTH engines anyway — and the oracle's
    # tok CTE carries the same WHERE so the corpus totals agree even on
    # hypothetical null-source rows). It is load-bearing for the plan:
    # the joins infer isnotnull(source)/isnotnull(w) into SOME of sw's
    # four consumer subtrees but not others (wc/tot see no keys), which
    # breaks canonical equality and makes AQE re-run the corpus-scale
    # (source, w) aggregation. Explicit and uniform, all four consumers
    # reuse ONE exchange — a single corpus pass (pinned).
    tok = d.select("source", F.explode(tokens("text")).alias("w")).filter(
        F.col("source").isNotNull() & F.col("w").isNotNull()
    )
    sw = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    stot = sw.groupBy("source").agg(F.sum("c").alias("ns"))
    wc = sw.groupBy("w").agg(F.sum("c").alias("cw"))
    tot = sw.agg(F.sum("c").alias("n"))

    def fx(col):
        return F.floor(col * F.lit(_SD_FX) + F.lit(0.5)).cast("long")

    qv = F.col("cw").cast("double") / F.col("n")
    qfx = (
        wc.crossJoin(F.broadcast(tot)).agg(F.sum(fx(qv)).alias("qsum_fx"))
    )
    per = (
        sw.join(stot, ["source"])
        .join(wc, ["w"])
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.sum(
                fx(F.abs(F.col("c").cast("double") / F.col("ns") - qv))
            ).alias("present_fx"),
            F.sum(fx(qv)).alias("qs_fx"),
        )
    )
    return (
        per.join(stot, ["source"])
        .crossJoin(F.broadcast(qfx))
        .select(
            "source",
            F.col("ns").alias("n_tokens"),
            (
                (
                    F.col("present_fx")
                    + (F.col("qsum_fx") - F.col("qs_fx"))
                ).cast("double") / F.lit(2 * _SD_FX)
            ).alias("tv_distance"),
        )
    )


# --- embedding_outliers -----------------------------------------------------

TOP_OUTLIERS = 5


def _embedding_outliers_oracle() -> str:
    # late import so THIS module's import stays registration-free even
    # though similarity.py registers queries on import; the oracle string
    # is built once at staged_specs() time
    from multithreaded_mapreduce_library_spark.operators.similarity import (
        _DUCK_LLOYD_CTES,
    )

    return f"""
WITH {_DUCK_LLOYD_CTES}
SELECT cid, vec_id,
       floor(d2 * 1000000 + 0.5) / 1000000 AS d2_r,
       rnk
FROM (
  SELECT cid, vec_id, d2,
         row_number() OVER (PARTITION BY cid ORDER BY d2 DESC, vec_id) AS rnk
  FROM a2
)
WHERE rnk <= {TOP_OUTLIERS}
"""


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle story (100 TB): training + assignment are the shared
    Lloyd core (TakeOrdered seeds, zero-exchange literal argmin, k x dim
    partial-agg update); the only NEW exchange is the per-cell ranking
    window on cid. At the gated k=8 the window has 8 partitions — fine
    at fixture scale; at real scale k ~ sqrt(N) cells keep partitions
    balanced, and a top-5-per-cell pre-aggregation under AQE bounds the
    sort. No joins on the data path at all."""
    from multithreaded_mapreduce_library_spark.operators.similarity import (
        _lloyd_final_assignment,
    )

    asn = _lloyd_final_assignment(spark, sf_dir, narrow=True)
    w = W.partitionBy("cid").orderBy(F.col("d2").desc(), "vec_id")
    return (
        asn.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_OUTLIERS)
        .select(
            "cid",
            "vec_id",
            (
                F.floor(F.col("d2") * F.lit(1000000) + F.lit(0.5))
                / F.lit(1000000)
            ).alias("d2_r"),
            "rnk",
        )
    )


def staged_specs() -> dict[str, QuerySpec]:
    """The staged (NOT registered) specs, in the registry's own shape so
    tests/oracle.py::compare_query can validate them verbatim."""
    return {
        "doc_ngram_novelty": QuerySpec(
            name="doc_ngram_novelty",
            builder=doc_ngram_novelty,
            oracle=DOC_NGRAM_NOVELTY_ORACLE,
            tags=("text", "dedup", "llm-pipeline", "staged-r18"),
            doc=doc_ngram_novelty.__doc__ or "",
        ),
        "source_divergence": QuerySpec(
            name="source_divergence",
            builder=source_divergence,
            oracle=SOURCE_DIVERGENCE_ORACLE,
            tags=("text", "mixture", "llm-pipeline", "staged-r18"),
            doc=source_divergence.__doc__ or "",
        ),
        "embedding_outliers": QuerySpec(
            name="embedding_outliers",
            builder=embedding_outliers,
            oracle=_embedding_outliers_oracle(),
            tags=("similarity", "kmeans", "quality", "llm-pipeline", "staged-r18"),
            doc=embedding_outliers.__doc__ or "",
        ),
        "stream_lm_score": QuerySpec(
            name="stream_lm_score",
            builder=stream_lm_score,
            oracle=_stream_lm_oracle(),
            tags=(
                "streaming", "text", "quality", "incremental",
                "llm-pipeline", "staged-r18-optional",
            ),
            doc=stream_lm_score.__doc__ or "",
        ),
    }


# --- stream_lm_score --------------------------------------------------------

# same explode as the batch twin (operators/text.py lm_bigram_score)
_BG_EXPR = (
    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
    " (a, b) -> struct(a AS w1, b AS w2))"
)


def lm_score_stream_transform(
    s: DataFrame, c2: DataFrame, c1: DataFrame, vocab_n: int
) -> DataFrame:
    """Streaming-legal scoring of an arriving document stream against a
    STATIC corpus-trained bigram model: per-row tokenize + bigram explode
    (narrow), stream-static LEFT equi-joins against the model tables
    (unseen bigrams/contexts coalesce to 0 and ride the same add-1
    smoothing: P = (c12+1)/(c_ctx+V), so a fully-novel transition scores
    1/V), V folded in as a literal (the streaming-twin precedent for
    constant model state — stream_dedup_semantic's centroid literals),
    then ONE keyed update-mode aggregation per arriving doc emitting
    monotone (n_bigrams, sum_fx) counters."""
    toks = s.select("doc_id", tokens("text").alias("t"))
    bg = (
        toks.filter(F.size("t") >= 2)
        .select("doc_id", F.explode(F.expr(_BG_EXPR)).alias("bgs"))
        .select("doc_id", "bgs.w1", "bgs.w2")
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(int(vocab_n))
    ).cast("double")
    return (
        bg.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .withColumn("p_fx", F.floor(p * F.lit(1000000) + F.lit(0.5)).cast("long"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("p_fx").alias("sum_fx"))
    )


def _stream_lm_oracle() -> str:
    from multithreaded_mapreduce_library_spark.operators.dedup import (
        _INC_BATCH_COND,
    )

    return f"""
WITH corpus AS (SELECT text FROM documents WHERE NOT {_INC_BATCH_COND}),
batch AS (SELECT doc_id, text FROM documents WHERE {_INC_BATCH_COND}),
tc AS (SELECT {duck_tokens('text')} AS t FROM corpus),
v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab
      FROM (SELECT unnest(t) AS w FROM tc)),
bgc AS (
  SELECT bgs.w1 AS w1, bgs.w2 AS w2 FROM (
    SELECT unnest(list_transform(range(2, len(t) + 1),
                  i -> {{'w1': t[i-1], 'w2': t[i]}})) AS bgs
    FROM tc WHERE len(t) >= 2
  )
),
c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bgc GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bgc GROUP BY w1),
tb AS (SELECT doc_id, {duck_tokens('text')} AS t FROM batch),
bgb AS (
  SELECT doc_id, bgs.w1 AS w1, bgs.w2 AS w2 FROM (
    SELECT doc_id, unnest(list_transform(range(2, len(t) + 1),
                          i -> {{'w1': t[i-1], 'w2': t[i]}})) AS bgs
    FROM tb WHERE len(t) >= 2
  )
)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       floor(CAST(CAST(sum(CAST(floor(
           (COALESCE(c2.c12, 0) + 1)
           / CAST(COALESCE(c1.c1, 0) + v.vocab AS DOUBLE) * 1000000 + 0.5
         ) AS BIGINT)) AS BIGINT) AS DOUBLE) / count(*) + 0.5) / 1000000
         AS avg_bigram_p
FROM bgb b
LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
LEFT JOIN c1 ON b.w1 = c1.w1
CROSS JOIN v
WHERE v.vocab > 0
GROUP BY b.doc_id
"""


def stream_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quality gate — the online half of lm_bigram_score: train
    the add-1-smoothed bigram model on the CORPUS split (the standard
    h31 % INC_SPLIT_MOD incremental convention), hold it static, and
    score ARRIVING documents (the batch split) as they stream in. The
    deployed perplexity-filter shape: the model is fixed at serving
    time, V covers corpus vocabulary only, and novel transitions in
    arriving text fall back to the smoothed floor — so scores are
    comparable across micro-batches. Shuffle story (100 TB): model =
    lm_bigram_score's one corpus-scale (w1,w2) agg + vocab-scale c_ctx
    re-agg, built once per deployment (persist it as a table in
    production — here it rides the replay); per micro-batch the arriving
    docs pay narrow explode + two stream-static keyed joins (vocab-sized
    static sides, broadcast when small) + one keyed update agg whose
    state is a (count, sum) pair per in-flight doc. Work scales with the
    batch, never the corpus. Finalize is the twins' defensive monoid
    merge (counters only grow across update emissions)."""
    from multithreaded_mapreduce_library_spark.operators.dedup import (
        INC_SPLIT_MOD,
    )
    from multithreaded_mapreduce_library_spark.functions import h31
    from multithreaded_mapreduce_library_spark.streaming.queries import (
        run_to_memory,
        table_stream,
    )

    is_batch = (
        F.pmod(h31(F.col("doc_id").cast("string")), F.lit(INC_SPLIT_MOD)) == 0
    )
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(~is_batch)
    toks_c = corpus.select(tokens("text").alias("t"))
    vocab_n = (
        toks_c.select(F.explode("t").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
        .collect()[0]["v"]
    )
    schema = "doc_id long, n_bigrams long, avg_bigram_p double"
    if not vocab_n:
        # all-batch corpus (or token-free corpus): no trained model =>
        # no scores on either engine (the oracle's WHERE v.vocab > 0)
        return spark.createDataFrame([], schema)
    bgc = (
        toks_c.filter(F.size("t") >= 2)
        .select(F.explode(F.expr(_BG_EXPR)).alias("bgs"))
        .select("bgs.w1", "bgs.w2")
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    c2 = bgc.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # derived c_ctx (the batch twin's shape); the oracle derives it
    # directly from the bigram stream — independent derivations must
    # agree exactly
    c1 = c2.groupBy("w1").agg(F.sum("c12").alias("c1"))
    stream = table_stream(spark, sf_dir, "documents").filter(is_batch)
    settled = run_to_memory(
        lm_score_stream_transform(stream, c2, c1, vocab_n), "update"
    )
    fin = settled.groupBy("doc_id").agg(
        F.max("n_bigrams").cast("long").alias("n_bigrams"),
        F.max("sum_fx").cast("long").alias("sum_fx"),
    )
    return fin.select(
        "doc_id",
        "n_bigrams",
        (
            F.floor(
                F.col("sum_fx").cast("double") / F.col("n_bigrams") + F.lit(0.5)
            ) / F.lit(1000000)
        ).alias("avg_bigram_p"),
    )
