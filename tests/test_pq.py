"""Product-quantization behavior beyond the oracle differential: code
shape, the Lloyd-improvement property of the refinement pass, ADC's
true-rank concentration (the calibration claim in sim_topk_pq's doc),
and the plan shape (broadcast codebooks/LUT, partial-agg update, no
cartesian fallback)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.plans import formatted_plan
from multithreaded_mapreduce_library_spark.registry import load_all

SPECS = load_all()


def test_pq_codes_shape_and_range(spark, sf_dir):
    """Every vector gets exactly PQ_M codes, each in [0, PQ_K)."""
    from multithreaded_mapreduce_library_spark.operators.pq import PQ_K, PQ_M

    rows = SPECS["pq_train_codes"].builder(spark, sf_dir).collect()
    per_vec: dict[int, set[int]] = {}
    for r in rows:
        assert 0 <= r["code"] < PQ_K, r
        per_vec.setdefault(r["vec_id"], set()).add(r["subspace"])
    assert all(ms == set(range(PQ_M)) for ms in per_vec.values())


def test_pq_refinement_improves_residual(spark, sf_dir):
    """The single Lloyd refinement must not increase total quantization
    error: sum of squared residuals under the UPDATED codebooks <= under
    the seed codebooks (k-means' monotone-improvement invariant, the PQ
    twin of test_lloyd_inertia_monotone)."""
    from multithreaded_mapreduce_library_spark.operators.pq import (
        PQ_K,
        _FX,
        _pq_assign,
        _pq_codebooks,
        _pq_sub,
    )

    sub = _pq_sub(spark, sf_dir)
    seeds = sub.filter(F.col("vec_id") < PQ_K).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("vc")
    )
    a1 = _pq_assign(sub, seeds)
    a2 = _pq_assign(sub, _pq_codebooks(a1))

    def total_fx(a):
        return a.agg(
            F.sum(F.floor(F.col("d2") * _FX + F.lit(0.5)).cast("long")).alias("t")
        ).collect()[0]["t"]

    t_seed, t_refined = total_fx(a1), total_fx(a2)
    assert t_refined <= t_seed, (t_refined, t_seed)


def test_pq_adc_concentrates_true_rank(spark, sf_dir):
    """The doc's calibration claim, pinned: ADC picks must land well
    inside the top third of the true-L2 ranking on average (random
    picking would average ~N/2). Recall@5 is NOT asserted — on the
    fixture's near-uniform vectors no fixed bit budget separates rank 5
    from rank 50, and pretending otherwise would make the test a
    fixture-shape lottery."""
    import numpy as np

    from multithreaded_mapreduce_library_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype="float64")

    picks: dict[int, list[int]] = {}
    for r in SPECS["sim_topk_pq"].builder(spark, sf_dir).collect():
        picks.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert picks, "no ADC results"

    pos = {int(v): i for i, v in enumerate(ids)}
    rank_sum = n_q = 0
    for q, neigh in picks.items():
        d2 = ((mat - mat[pos[q]]) ** 2).sum(axis=1)
        order = np.argsort(d2, kind="stable")
        rank_of = {int(ids[j]): k for k, j in enumerate(order)}
        rank_sum += sum(rank_of[g] for g in neigh) / len(neigh)
        n_q += 1
    mean_rank = rank_sum / n_q
    assert mean_rank < 0.30 * len(ids), (
        f"ADC picks average true-L2 rank {mean_rank:.0f} of {len(ids)} — "
        "no better than coarse chance"
    )


def test_ivfpq_serving_is_cell_local_and_float_free(spark, sf_dir):
    """IVF-PQ structural contract: every returned neighbor shares its
    query's TRAINED Lloyd cell, ranks are dense from 1, and — the plan
    half — no shuffle exchange keyed on the serving keys (cell id /
    query id) carries a float-vector column: candidates travel as
    (ids, tinyint codes), ADC scores as one BIGINT, floats reappear only
    through the broadcast rerank. Training exchanges (keyed vec_id/m)
    legitimately carry vectors and are exempt."""
    import re

    cells = {
        r["vec_id"]: r["cell_id"]
        for r in SPECS["ivf_train_centroids"].builder(spark, sf_dir).collect()
    }
    rows = SPECS["sim_topk_ivfpq"].builder(spark, sf_dir).collect()
    assert rows, "ivfpq returned nothing"
    by_q: dict[int, list[int]] = {}
    for r in rows:
        assert cells[r["query_id"]] == cells[r["neighbor_id"]], (
            f"neighbor {r['neighbor_id']} outside query {r['query_id']}'s cell"
        )
        by_q.setdefault(r["query_id"], []).append(r["rnk"])
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), (q, rnks)

    plan = formatted_plan(SPECS["sim_topk_ivfpq"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # r22 serving-residual pins (VERDICT r21 #1, strengthened — the r21
    # plan had 6 parquet scans and a vec_id-keyed code-array exchange):
    # the materialized index is read as ExistingRDD, the only parquet
    # scans left are the query-LUT build and the rerank's two float
    # re-acquisitions, nothing sort-merges, and no corpus-wide
    # vec_id-keyed exchange exists anywhere in the serving plan.
    assert "Scan ExistingRDD" in plan, "index frame must be materialized"
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert n_scans <= 3, f"serving must not re-plan the index ({n_scans} scans)"
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(vec_id" not in plan, (
        "the narrow code build must not re-grow the groupBy(vec_id) exchange"
    )
    float_cols = re.compile(r"\b(v|uv|va|vb|sv|norm)#")
    blocks = re.findall(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\n"
        r"Arguments: hashpartitioning\((\w+)#",
        plan,
    )
    assert blocks
    for cols, key in blocks:
        if key in ("cid", "qcid", "query_id", "neighbor_id"):
            assert not float_cols.search(cols), (
                f"float-vector column crosses the {key}-keyed serving "
                f"exchange: [{cols}]"
            )


def test_pq_plan_literal_training_and_broadcast_lut(spark, sf_dir):
    """r21/r22 narrow-PQ contract: the serving plan contains NO join for
    the codebook at all (assignment is the literal argmin riding the
    scan — the only join left is the documented tiny-query-side LUT
    nested-loop broadcast), the per-vector code array is the r22 narrow
    projection (no subvector explode, no corpus-wide groupBy(vec_id)
    exchange — the only keyed exchanges left are the tiny query_id LUT
    assembly and the top-k window), and nothing falls back to a
    cartesian product or a sort-merge join."""
    plan = formatted_plan(SPECS["sim_topk_pq"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan, (
        "the literal argmin must not re-grow a codebook join"
    )
    assert "BroadcastNestedLoopJoin" in plan, "query LUT must broadcast"
    assert "hashpartitioning(vec_id" not in plan, (
        "the narrow code build must not re-grow the groupBy(vec_id) exchange"
    )
    import re

    n_generate = len(re.findall(r"^\(\d+\) Generate", plan, re.M))
    assert n_generate <= 1, (
        "only the tiny query-side LUT subvector explode may Generate — "
        "the corpus-side code build must stay a narrow projection"
    )


def test_pq_narrow_assign_agrees_with_window(spark, sf_dir):
    """The r21 literal-argmin migration's bit-identity claim, pinned the
    same way as test_lloyd_narrow_assign_agrees_with_window: for both
    the seed and the refined codebooks, _pq_assign_narrow must return
    EXACTLY the window path's (vec_id, m, cid, d2) — same argmin, same
    (d2, cid) tiebreak, bit-identical doubles."""
    from multithreaded_mapreduce_library_spark.operators.pq import (
        PQ_K,
        _pq_assign,
        _pq_assign_narrow,
        _pq_codebooks,
        _pq_sub,
    )

    sub = _pq_sub(spark, sf_dir)
    seeds_df = sub.filter(F.col("vec_id") < PQ_K).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("vc")
    )
    seed_rows = seeds_df.collect()

    def canon(df):
        return sorted(
            (r["vec_id"], r["m"], r["cid"], r["d2"]) for r in df.collect()
        )

    a1_window = _pq_assign(sub, seeds_df)
    a1_narrow = _pq_assign_narrow(sub, seed_rows)
    assert canon(a1_narrow) == canon(a1_window), "seed-pass argmin diverged"

    newc_df = _pq_codebooks(a1_window)
    assert canon(_pq_assign_narrow(sub, newc_df.collect())) == canon(
        _pq_assign(sub, newc_df)
    ), "refined-pass argmin diverged"


def test_pq_narrow_codes_agree_with_grouped(spark, sf_dir):
    """The r22 narrow code-array migration's bit-identity claim, pinned
    like test_pq_narrow_assign_agrees_with_window: _pq_codes_narrow's
    one-projection (vec_id, codes) must EXACTLY equal the grouped path
    _pq_code_arrays(_pq_assign_narrow(...)) — same argmin per subspace,
    same m-ordered array, same tinyint values — for both the seed and
    the refined codebooks."""
    from multithreaded_mapreduce_library_spark.operators.pq import (
        PQ_K,
        _pq_assign_narrow,
        _pq_code_arrays,
        _pq_codebooks,
        _pq_codes_narrow,
        _pq_sub,
    )
    from multithreaded_mapreduce_library_spark.operators.similarity import (
        _dvec,
        _load_embeddings,
    )

    e = _load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec("embedding").alias("v")
    )
    sub = _pq_sub(spark, sf_dir)
    seed_rows = (
        sub.filter(F.col("vec_id") < PQ_K)
        .select("m", F.col("vec_id").alias("cid"), F.col("sv").alias("vc"))
        .collect()
    )

    def canon(df):
        return sorted((r["vec_id"], list(r["codes"])) for r in df.collect())

    for rows in (seed_rows, _pq_codebooks(_pq_assign_narrow(sub, seed_rows)).collect()):
        grouped = _pq_code_arrays(_pq_assign_narrow(sub, rows))
        narrow = _pq_codes_narrow(e, rows)
        assert canon(narrow) == canon(grouped), "narrow code arrays diverged"


def test_ivfpq_coded_matches_unmaterialized_parts(spark, sf_dir):
    """_ivfpq_coded's fused-collect + checkpointed index frame must hold
    exactly the (vec_id, cell id, code array) triples the r21
    unmaterialized path computed: Lloyd cells from
    _lloyd_final_assignment, code arrays from the grouped PQ path."""
    from multithreaded_mapreduce_library_spark.operators.pq import (
        _ivfpq_coded,
        _pq_code_arrays,
        _pq_final,
    )
    from multithreaded_mapreduce_library_spark.operators.similarity import (
        _lloyd_final_assignment,
    )

    coded, newc = _ivfpq_coded(spark, sf_dir)
    got = sorted(
        (r["vec_id"], r["cid"], list(r["codes"])) for r in coded.collect()
    )
    cells = {
        r["vec_id"]: r["cid"]
        for r in _lloyd_final_assignment(spark, sf_dir, narrow=True)
        .select("vec_id", "cid")
        .collect()
    }
    assigned, newc_ref = _pq_final(spark, sf_dir)
    want = sorted(
        (r["vec_id"], cells[r["vec_id"]], list(r["codes"]))
        for r in _pq_code_arrays(assigned).collect()
    )
    assert got == want, "materialized IVF-PQ index diverged"
    # and the fused collect returns the same trained codebooks
    k_got = sorted((r["m"], r["cid"], list(r["vc"])) for r in newc)
    k_want = sorted((r["m"], r["cid"], list(r["vc"])) for r in newc_ref)
    assert k_got == k_want, "fused codebook collect diverged"


def test_zorder_buckets_are_prunable_envelopes(spark, sf_dir):
    """The layout claim, pinned: z-bucket min/max envelopes must be
    SMALL rectangles — mean partkey span per bucket well under the
    global span (measured 0.06-0.07; bound 0.25) — because that envelope
    IS the file-statistic a scan prunes against after the z-order write.
    (The suppkey dimension's range is single-digit at small SF, so its
    envelopes are necessarily wide — the high-order interleaved
    dimension carries the pruning power there.) Plus conservation: the
    buckets partition the table."""
    from multithreaded_mapreduce_library_spark.operators.pipeline import N_Z_BUCKETS
    from multithreaded_mapreduce_library_spark.sources import load_table

    rows = SPECS["layout_zorder"].builder(spark, sf_dir).collect()
    assert 4 < len(rows) <= N_Z_BUCKETS + 1
    assert all(0 <= r["bucket"] <= N_Z_BUCKETS for r in rows)
    total = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_rows"] for r in rows) == total

    gp = max(r["p_max"] for r in rows) - min(r["p_min"] for r in rows)
    mean_span = sum((r["p_max"] - r["p_min"]) / max(gp, 1) for r in rows) / len(rows)
    assert mean_span < 0.25, (
        f"z-buckets' partkey envelopes average {mean_span:.2f} of the global "
        "span — no pruning power"
    )


def test_ivfq_serving_over_materialized_index_matches_end_to_end(
    spark, sf_dir, tmp_path
):
    """The bench.py serving-only measurement is honest only if
    probe→shortlist→rerank over a MATERIALIZED (vec_id, cid, codes)
    index table returns exactly what the end-to-end capstone (which
    trains in-query) returns — pin that equivalence."""
    from multithreaded_mapreduce_library_spark.operators.similarity import (
        _ivfq_coded,
        _ivfq_shortlist_ids,
        exact_cosine_rerank,
    )

    idx_path = str(tmp_path / "ivfq_index")
    _ivfq_coded(spark, sf_dir).write.mode("overwrite").parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    served = exact_cosine_rerank(
        spark, sf_dir, _ivfq_shortlist_ids(spark, sf_dir, coded=idx), 3
    )
    e2e = SPECS["sim_topk_ivf_quantized"].builder(spark, sf_dir)
    canon = lambda df: sorted(tuple(map(str, r)) for r in df.collect())
    assert canon(served) == canon(e2e)
