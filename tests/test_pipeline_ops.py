"""Invariant tests for the dataset-management operators: the properties
their docstrings claim (partition-layout independence, stratum uniformity,
packing capacity) hold by construction — assert them directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.operators.pipeline import (
    PACK_CAPACITY,
    TRAIN_CUT,
    VAL_CUT,
    dataset_split,
    sample_stratified,
    sequence_packing,
)
from multithreaded_mapreduce_library_spark.registry import load_all
from multithreaded_mapreduce_library_spark.sources import load_table

SPECS = load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_split_is_partition_layout_independent(spark, sf_dir):
    """The split assignment must be a pure function of the row — identical
    results no matter how the source is partitioned (the property that
    makes the split reproducible on any cluster)."""
    base = _rows(dataset_split(spark, sf_dir))

    d = load_table(spark, sf_dir, "documents").repartition(7)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10).cast("long")
        % 2_147_483_647,
        F.lit(100),
    )
    split = (
        F.when(bucket < TRAIN_CUT, "train").when(bucket < VAL_CUT, "val").otherwise("test")
    )
    from multithreaded_mapreduce_library_spark.functions import tokens

    again = _rows(
        d.select(split.alias("split"), "lang", F.size(tokens("text")).alias("n_tok"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    assert base == again


def test_split_fractions_roughly_match_cuts(spark, sf_dir):
    counts = {
        r["split"]: r["n"]
        for r in dataset_split(spark, sf_dir)
        .groupBy("split")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    # md5 buckets are uniform; at fixture sizes allow generous slack
    assert abs(counts["train"] / total - TRAIN_CUT / 100) < 0.12
    assert counts["train"] > counts["val"]
    assert counts["train"] > counts["test"]


def test_sample_subset_and_layout_independent(spark, sf_dir):
    from multithreaded_mapreduce_library_spark.operators.pipeline import (
        SAMPLE_PER_MILLE,
        _split_bucket,
    )
    from multithreaded_mapreduce_library_spark.functions import h31

    d = load_table(spark, sf_dir, "documents")
    sample = _rows(sample_stratified(spark, sf_dir))
    all_ids = {r["doc_id"] for r in d.select("doc_id").collect()}
    assert 0 < len(sample) < len(all_ids)
    assert {t[0] for t in sample} <= all_ids
    # independence from the scan layout: identical rows when the keep
    # predicate is applied to a deliberately re-partitioned source
    # (contrast df.sample(), which changes with partition layout)
    keep = F.pmod(h31(F.col("doc_id").cast("string")), F.lit(1000)) < SAMPLE_PER_MILLE
    again = _rows(
        d.repartition(11).filter(keep).select("doc_id", "lang", "n_chars")
    )
    assert again == sample
    # sanity: _split_bucket shares the same hash family (docs in both the
    # sample and a split is the normal, consistent case)
    assert _split_bucket("doc_id") is not None


def test_sequence_packing_respects_capacity(spark, sf_dir):
    """Every bin's exclusive prefix start lies on a capacity boundary and
    per-bin totals only exceed capacity by at most one document's tokens
    (next-fit chunking semantics: a doc is never split)."""
    d = load_table(spark, sf_dir, "documents")
    from multithreaded_mapreduce_library_spark.functions import tokens

    max_doc_tokens = d.select(F.max(F.size(tokens("text"))).alias("m")).collect()[0]["m"]
    for r in sequence_packing(spark, sf_dir).collect():
        assert r["bin"] >= 0
        assert r["total_tokens"] <= PACK_CAPACITY + max_doc_tokens
        assert r["n_docs"] >= 1


def test_contamination_only_flags_test_docs(spark, sf_dir):
    from multithreaded_mapreduce_library_spark.operators.pipeline import (
        VAL_CUT,
        _split_bucket,
        contamination_check,
    )

    d = load_table(spark, sf_dir, "documents")
    # the contamination test split IS dataset_split's test split
    test_ids = {
        r["doc_id"]
        for r in d.select("doc_id").filter(_split_bucket("doc_id") >= VAL_CUT).collect()
    }
    out = contamination_check(spark, sf_dir).collect()
    assert {r["test_doc_id"] for r in out} <= test_ids
    for r in out:
        assert r["n_shared_shingles"] >= r["n_contaminating_docs"] >= 1


def test_star_contraction_converges_on_long_chain(spark):
    """The ADVICE-flagged failure mode: a duplicate-chain component with
    diameter >> the round cap. One-hop min-label propagation needs
    O(diameter) rounds (200 here); large-star/small-star needs O(log^2 n)
    — assert it labels the whole chain with its minimum well inside the
    operator's 32-round cap."""
    import pyspark.sql.functions as F

    from multithreaded_mapreduce_library_spark.operators.dedup import (
        _large_star,
        _small_star,
    )

    n = 201  # path 0-1-2-...-200: diameter 200
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(n - 1)], "hi long, lo long"
    ).localCheckpoint()

    def probe(e):
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(hi, lo))"), F.lit(0)).alias("cs"),
        ).collect()[0]
        return row["n"], row["cs"]

    prev = probe(edges)
    rounds = 0
    for _ in range(32):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        rounds += 1
        cur = probe(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise AssertionError("did not converge within the operator's cap")

    labels = {
        r["hi"]: r["lo"]
        for r in edges.groupBy("hi").agg(F.min("lo").alias("lo")).collect()
    }
    assert rounds < 15, f"converged but too slowly ({rounds} rounds)"
    assert set(labels) == set(range(1, n)), "every non-root node gets a star edge"
    assert all(v == 0 for v in labels.values()), "all labels must be the component min"


def test_cli_list(capsys):
    from multithreaded_mapreduce_library_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "wordcount" in out and "[oracle" in out
    assert main(["list", "--tag", "llm-pipeline"]) == 0
    tagged = capsys.readouterr().out
    assert "dedup_minhash" in tagged and "join_large" not in tagged
    # unknown query name on run/explain fails fast without a session
    assert main(["explain", "not_a_query"]) == 2


def test_cli_explain_subprocess(sf_dir):
    """The CLI's session-owning paths run in a subprocess (they stop their
    session — must not touch the suite's). explain must surface the
    formatted plan with scan pushdown visible."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "multithreaded_mapreduce_library_spark", "explain", "filter_project", "--sf", sf_dir],
        capture_output=True,
        text=True,
        timeout=180,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PushedFilters" in out.stdout
    assert "Scan parquet" in out.stdout


def test_incremental_minhash_agrees_with_batch_minhash(spark, sf_dir):
    """Cross-operator consistency anchor: every dedup_minhash candidate
    pair that straddles the incremental split (one side in the arriving
    batch, the other in the existing corpus) must surface in
    dedup_minhash_incremental — as a candidate always, and as the dup
    verdict when its signature agreement clears the admission bar. The
    two operators share the shingle/minhash machinery, so a divergence
    here means the split or probe-join logic broke, not the hashing."""
    from multithreaded_mapreduce_library_spark.functions import MOD_P
    from multithreaded_mapreduce_library_spark.operators.dedup import (
        INC_MIN_MATCHES,
        INC_SPLIT_MOD,
        N_HASHES,
    )
    from multithreaded_mapreduce_library_spark.registry import load_all

    specs = load_all()
    import hashlib

    def is_batch(doc_id: int) -> bool:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % MOD_P
        return h % INC_SPLIT_MOD == 0

    pairs = specs["dedup_minhash"].builder(spark, sf_dir).collect()
    inc = {
        r["doc_id"]: r
        for r in specs["dedup_minhash_incremental"].builder(spark, sf_dir).collect()
    }
    straddling = [
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in pairs
        if is_batch(r["doc_a"]) != is_batch(r["doc_b"])
    ]
    assert straddling, "fixture must contain cross-split near-dup pairs"
    for a, b, est in straddling:
        nd = a if is_batch(a) else b
        row = inc[nd]
        assert row["n_candidates"] >= 1, f"batch doc {nd} lost its candidate"
        if round(est * N_HASHES) >= INC_MIN_MATCHES:
            assert row["is_dup"], f"batch doc {nd} (est={est}) must be flagged dup"


def _write_tiny_rag_fixture(out_dir, texts, n_embedded):
    """Write documents/embeddings parquet with the checked-in schemas but a
    corpus small enough that the fused shortlist has < MMR_K candidates —
    the termination path no sf fixture reaches (ADVICE r10)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import numpy as np

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["src0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        ),
        str(out_dir / "documents.parquet"),
    )
    from multithreaded_mapreduce_library_spark.operators.similarity import DIM

    rng = np.random.default_rng(11)
    emb = rng.uniform(-0.5, 0.5, (n_embedded, DIM)).astype("float32")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_embedded), type=pa.int64()),
                "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
                "label": pa.array([0] * n_embedded, type=pa.int32()),
            }
        ),
        str(out_dir / "embeddings.parquet"),
    )


def _mmr_oracle_rows(sf_dir: str):
    import duckdb

    from multithreaded_mapreduce_library_spark.operators.pipeline import _mmr_oracle

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = con.execute(_mmr_oracle()).fetchall()
    con.close()
    return sorted(rows)


def test_mmr_rerank_shortlist_smaller_than_k(spark, tmp_path):
    """Tiny corpus: 5 docs / 5 embeddings -> fused shortlist < MMR_K=10.
    The Python greedy's break and the oracle's EXISTS guard + max(step)
    selection must produce identical (doc_id, mmr_rank, rrf) output."""
    from multithreaded_mapreduce_library_spark.operators.pipeline import (
        MMR_K,
        mmr_rerank,
    )

    texts = [
        "spark join window shuffle",       # doc 0 = the query vector's doc
        "spark window partition",
        "join join broadcast",
        "window rank frame",
        "filter project scan",             # no BM25 term: sem-leg-only doc
    ]
    _write_tiny_rag_fixture(tmp_path, texts, n_embedded=5)
    got = sorted(
        tuple(r) for r in mmr_rerank(spark, str(tmp_path)).collect()
    )
    assert 0 < len(got) < MMR_K
    want = _mmr_oracle_rows(str(tmp_path))
    assert got == want


def test_mmr_rerank_empty_shortlist(spark, tmp_path):
    """No BM25-term matches and no non-query embeddings -> empty fused
    shortlist: both the Spark greedy (early return) and the recursive-CTE
    oracle (NULL anchor, dropped by the final join) must return 0 rows."""
    from multithreaded_mapreduce_library_spark.operators.pipeline import mmr_rerank

    _write_tiny_rag_fixture(
        tmp_path, ["filter project scan", "sort limit exchange"], n_embedded=1
    )
    df = mmr_rerank(spark, str(tmp_path))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "mmr_rank", "rrf"]
    assert _mmr_oracle_rows(str(tmp_path)) == []
