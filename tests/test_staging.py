"""Validation for STAGED (unregistered) flagship candidates.

operators/staging.py is not in registry._OPERATOR_MODULES — nothing here
touches the driver-gated surface. These tests are the pre-landing
evidence the r15 verdict prescribes for new flagships ("pre-staged with a
validated oracle ... the way the seeds alignment was"): the oracle
differential must be green on the checked-in fixture AND on a freshly
generated different-seed fixture (the forcing test — a constant silently
calibrated to one corpus distribution fails on the second). Per-query
known-values and plan-shape pins live alongside each staged spec and
migrate with it on landing (lm_bigram_score's are now in
tests/test_text_lm.py).

Both tests parametrize over whatever staged_specs() returns, so an empty
queue (e.g. right after a landing) costs nothing and a new staged spec
gets the differential evidence automatically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.operators.staging import staged_specs
from tests.oracle import compare_query

SPECS = staged_specs()


def test_staged_specs_not_registered():
    """A staged spec must not leak into the gated surface: landing means
    MOVING it under @register, not double-registering."""
    from multithreaded_mapreduce_library_spark.registry import load_all

    clash = set(SPECS) & set(load_all())
    assert not clash, f"staged specs already registered: {sorted(clash)}"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_staged_matches_oracle(spark, sf_dir, name):
    compare_query(spark, SPECS[name], sf_dir)


FORCING_SEED = 1201  # must be recorded in gen_fixture.BURNED_SEEDS


def test_forcing_seed_is_registered_as_burned():
    """The canonical burned-seed list lives in scripts/gen_fixture.py
    (r16 verdict hygiene item); a forcing seed that isn't recorded there
    could be re-picked later as a 'fresh' sweep seed."""
    from scripts.gen_fixture import BURNED_SEEDS

    assert FORCING_SEED in BURNED_SEEDS


@pytest.fixture(scope="session")
def fresh_seed_dir(tmp_path_factory):
    """One forcing-seed fixture shared by every staged differential (99
    was burned by lm_bigram_score's r16 staging; see
    gen_fixture.BURNED_SEEDS for the full registry)."""
    from scripts.gen_fixture import generate

    out = str(tmp_path_factory.mktemp(f"staging_seed{FORCING_SEED}"))
    generate(out, seed=FORCING_SEED)
    return out


@pytest.mark.parametrize("name", sorted(SPECS))
def test_staged_matches_oracle_on_fresh_seed(spark, fresh_seed_dir, name):
    """The forcing test: regenerate the fixture at an unburned seed and
    re-run the differential. Runs unconditionally (unlike the env-gated
    full sweep): a few staged queries on one 500-doc fixture cost
    seconds, and landing without this evidence would repeat the pre-r15
    seeds-CTE hazard."""
    compare_query(spark, SPECS[name], fresh_seed_dir)


# --- per-query known-values + plan pins (migrate with each spec on landing)


def _write_docs(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": [r[2] for r in rows],
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], type=pa.int64()
                ),
            }
        ),
        str(path / "documents.parquet"),
    )


def test_doc_ngram_novelty_known_values(spark, tmp_path):
    """Hand-checked: doc0 'a b c d' -> distinct trigrams {abc, bcd};
    doc1 'a b c' -> {abc}; doc2 'x' excluded (<3 tokens); doc3
    'p q p q p' -> raw trigrams pqp,qpq,pqp -> DISTINCT {pqp, qpq}.
    df: abc=2, bcd=1, pqp=1, qpq=1. doc0: n=2 novel=1 frac=0.5;
    doc1: n=1 novel=0 frac=0.0; doc3: n=2 novel=2 frac=1.0."""
    d = tmp_path / "micro"
    d.mkdir()
    _write_docs(
        d, [(0, "a b c d", "s"), (1, "a b c", "s"), (2, "x", "s"), (3, "p q p q p", "s")]
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["n_novel"], r["novel_frac"])
        for r in SPECS["doc_ngram_novelty"].builder(spark, str(d)).collect()
    }
    assert got == {0: (2, 1, 0.5), 1: (1, 0, 0.0), 3: (2, 2, 1.0)}


def test_doc_ngram_novelty_plan_shape(spark, sf_dir):
    """No all-pairs anywhere: the df join is an equi-join on the trigram
    key — never a nested loop or cartesian carrying doc x doc work."""
    from tests.test_plans import formatted_plan

    plan = formatted_plan(SPECS["doc_ngram_novelty"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _final_adaptive_plan(df) -> str:
    """Execute and return the FINAL adaptive plan section only (reuse
    and the true scan count only materialize there; the toString also
    re-prints the initial plan below a marker, which would double-count
    scans)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return plan.split("== Initial Plan ==")[0]


@pytest.mark.parametrize(
    "name", ["doc_ngram_novelty", "source_divergence"]
)
def test_staged_text_queries_are_one_corpus_pass(spark, sf_dir, name):
    """Both text candidates must read documents EXACTLY ONCE in the
    executed plan: every downstream consumer (df table; stot/wc/tot and
    the scoring join) rides a ReusedExchange of the first corpus-scale
    aggregation. For source_divergence this is load-bearing code (the
    explicit not-null filter keeps the four sw subtrees canonically
    equal — without it AQE re-runs the corpus agg); for novelty it
    pins the symmetric-inference status quo."""
    final = _final_adaptive_plan(SPECS[name].builder(spark, sf_dir))
    assert final.count("FileScan parquet") == 1, "documents must scan once"
    assert "ReusedExchange" in final


def test_source_divergence_known_values(spark, tmp_path):
    """Hand-checked: source s1 tokens [a a b] (ns=3), s2 [b] (ns=1);
    corpus a:2 b:2 N=4, q_a=q_b=0.5 so fx(q)=500000 each, qsum=1000000.
    s1 present: |2/3-1/2|=|1/3-1/2|=1/6 -> fx=166667 each -> 333334;
    qs=1000000 -> absent 0 -> tv=333334/2e6=0.166667.
    s2 present: |1-1/2| -> fx=500000; qs=500000 -> absent 500000 ->
    tv=1000000/2e6=0.5 (exact TV of (0,1) vs (.5,.5))."""
    d = tmp_path / "micro"
    d.mkdir()
    _write_docs(d, [(0, "a a b", "s1"), (1, "b", "s2")])
    got = {
        r["source"]: (r["n_tokens"], r["tv_distance"])
        for r in SPECS["source_divergence"].builder(spark, str(d)).collect()
    }
    assert got == {"s1": (3, 0.166667), "s2": (1, 0.5)}


def test_source_divergence_plan_shape(spark, sf_dir):
    """The only nested-loop joins are the three 1-row broadcasts (tot
    twice, qsum once); the scoring joins are equi-joins on w/source."""
    import re

    from tests.test_plans import formatted_plan

    plan = formatted_plan(SPECS["source_divergence"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan

    def nodes(kind: str) -> int:
        return len(re.findall(rf"^\(\d+\) {kind}", plan, re.M))

    assert nodes("BroadcastNestedLoopJoin") == 3
    assert (
        nodes("SortMergeJoin") + nodes("ShuffledHashJoin") + nodes("BroadcastHashJoin")
        >= 3
    ), "sw-stot, sw-wc and per-stot must be equi-joins"


def test_embedding_outliers_known_values(spark, tmp_path):
    """Hand-checked 9-vector corpus (dim 2 — the builder is
    dimension-agnostic; only the DuckDB oracle pins DIM): v0=(0,0),
    vk=(100k,0) for k=1..7, v8=(2,0). Seeds = 8 smallest vec_ids (0..7).
    Round 1: v8 joins cell 0 (d2 4 vs 9604+); update moves c0 to the
    exact fixed-point mean (1,0), others stay on themselves. Re-assign:
    v0 and v8 both d2=1.0 in cell 0 (tie -> vec_id order), vk d2=0 in
    their own cells."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "micro"
    d.mkdir()
    vecs = [[0.0, 0.0]] + [[100.0 * k, 0.0] for k in range(1, 8)] + [[2.0, 0.0]]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(9), type=pa.int64()),
                "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
                "label": ["l"] * 9,
            }
        ),
        str(d / "embeddings.parquet"),
    )
    got = sorted(
        (r["cid"], r["vec_id"], r["d2_r"], r["rnk"])
        for r in SPECS["embedding_outliers"].builder(spark, str(d)).collect()
    )
    want = sorted(
        [(0, 0, 1.0, 1), (0, 8, 1.0, 2)]
        + [(k, k, 0.0, 1) for k in range(1, 8)]
    )
    assert got == want


def test_embedding_outliers_plan_shape(spark, sf_dir):
    """Training + assignment ride the zero-exchange narrow argmin, so
    the whole query has NO join nodes; the only new exchange over the
    bare scan is the per-cell ranking window, and Spark pushes the
    rnk<=5 filter into a WindowGroupLimit (each partition keeps top-5
    before the final sort — the property that bounds the sort at
    scale)."""
    import re

    from tests.test_plans import formatted_plan

    plan = formatted_plan(SPECS["embedding_outliers"].builder(spark, sf_dir))

    def nodes(kind: str) -> int:
        return len(re.findall(rf"^\(\d+\) {kind}\b", plan, re.M))

    for join in (
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastHashJoin",
    ):
        assert join not in plan, f"outliers must not join ({join})"
    assert nodes("Window") == 1
    assert "WindowGroupLimit" in plan, "rank limit must push into the window"


def test_stream_lm_score_known_values(spark, tmp_path):
    """Hand-checked with the REAL h31 split (doc_ids 0/3/4 land in the
    arriving batch, 1/2 in the corpus — verified against the md5
    arithmetic offline). Corpus: 'a b a b' + 'b c' -> c2: ab=2, ba=1,
    bc=1; c_ctx: a=2, b=2; V={a,b,c}=3. Arriving: doc0 'a b x' ->
    P(b|a)=0.6, P(x|b) unseen bigram seen context = (0+1)/(2+3)=0.2 ->
    avg 0.4; doc3 'c' (1 token, excluded); doc4 'x y' -> fully novel
    transition = (0+1)/(0+3) -> fx floor(333333.33+0.5)=333333 ->
    0.333333."""
    d = tmp_path / "micro"
    d.mkdir()
    _write_docs(
        d,
        [
            (0, "a b x", "s"),
            (1, "a b a b", "s"),
            (2, "b c", "s"),
            (3, "c", "s"),
            (4, "x y", "s"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_bigram_p"])
        for r in SPECS["stream_lm_score"].builder(spark, str(d)).collect()
    }
    assert got == {0: (2, 0.4), 4: (1, 0.333333)}


def test_stream_lm_score_multibatch_settles_to_single_batch(spark, sf_dir, tmp_path):
    """Cross-batch state transitions, the streaming-twin obligation: split
    the arriving docs into 2 part files, replay with maxFilesPerTrigger=1
    (several data batches), drive the SAME transform + monoid finalize,
    and require the result equal the gated single-batch settle. Each doc
    arrives whole (files split on row boundaries), so update-mode state
    transitions happen across docs, and the max-merge finalize must be
    batching-invariant."""
    import os

    import pyarrow.parquet as pq_

    from multithreaded_mapreduce_library_spark.functions import h31, tokens
    from multithreaded_mapreduce_library_spark.operators.dedup import INC_SPLIT_MOD
    from multithreaded_mapreduce_library_spark.operators.staging import (
        _BG_EXPR,
        lm_score_stream_transform,
    )
    from multithreaded_mapreduce_library_spark.sources import load_table

    single = {
        tuple(r)
        for r in SPECS["stream_lm_score"].builder(spark, sf_dir).collect()
    }
    assert single, "fixture must score at least one arriving doc"

    # rebuild the static model exactly as the builder does
    is_batch = (
        F.pmod(h31(F.col("doc_id").cast("string")), F.lit(INC_SPLIT_MOD)) == 0
    )
    d = load_table(spark, sf_dir, "documents")
    toks_c = d.filter(~is_batch).select(tokens("text").alias("t"))
    vocab_n = (
        toks_c.select(F.explode("t").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
        .collect()[0]["v"]
    )
    bgc = (
        toks_c.filter(F.size("t") >= 2)
        .select(F.explode(F.expr(_BG_EXPR)).alias("bgs"))
        .select("bgs.w1", "bgs.w2")
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    c2 = bgc.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c2.groupBy("w1").agg(F.sum("c12").alias("c1"))

    # split documents.parquet into 2 time-ordered part files
    out = tmp_path / "docs_multi"
    out.mkdir()
    t = pq_.read_table(os.path.join(sf_dir, "documents.parquet"))
    n = t.num_rows
    import time as time_

    t0 = time_.time() - 600
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        p = str(out / f"part-{i:02d}.parquet")
        pq_.write_table(t.slice(lo, hi - lo), p)
        os.utime(p, (t0 + 30 * i, t0 + 30 * i))

    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(out))
        .filter(is_batch)
    )
    name = "stream_lm_mb_sink"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            lm_score_stream_transform(stream, c2, c1, vocab_n)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_data_batches = sum(1 for p in q.recentProgress if p.numInputRows > 0)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert n_data_batches >= 2, "replay must be genuinely multi-batch"
    settled = spark.table(name)
    fin = settled.groupBy("doc_id").agg(
        F.max("n_bigrams").cast("long").alias("n_bigrams"),
        F.max("sum_fx").cast("long").alias("sum_fx"),
    )
    multi = {
        tuple(r)
        for r in fin.select(
            "doc_id",
            "n_bigrams",
            (
                F.floor(
                    F.col("sum_fx").cast("double") / F.col("n_bigrams")
                    + F.lit(0.5)
                ) / F.lit(1000000)
            ).alias("avg_bigram_p"),
        ).collect()
    }
    assert multi == single
