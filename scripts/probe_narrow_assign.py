"""Prototype probe: zero-exchange Lloyd assignment vs the window argmin.

The current ``_lloyd_assign`` broadcast-cross-joins the k-row centroid
frame and picks the argmin with a ``row_number`` window partitioned by
``vec_id`` — correct and bounded (exactly k rows per key), but the window
is a REAL exchange + sort of N*k rows: the one wide shuffle left in the
Lloyd family.  This probe evaluates the staged alternative: fetch the k
centroids to the driver (k x dim doubles — constant, same class as the
accepted k-row centroid fetches elsewhere), fold them into the plan as a
literal ``array<struct<cid, vc>>``, and compute the argmin per row with
``array_min(transform(...))`` — a single narrow projection, zero
exchange, whole-stage codegen.

Checks, in order:
  1. bit-identity of (vec_id, cid, d2) between the two assigns at the
     given sf (d2 compared exactly as doubles);
  2. bit-identity of one full downstream consumer (ivf_train_centroids'
     final select) when the narrow assign replaces BOTH assign calls
     (seed-assign inside training and the final assignment);
  3. wall-clock of the end-to-end sim_topk_ivf_quantized query with and
     without the narrow assign (best of --iters).

Usage: python scripts/probe_narrow_assign.py [sf_dir] [--iters N]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from multithreaded_mapreduce_library_spark.operators import similarity as S


_ORIG_ASSIGN = S._lloyd_assign


def narrow_assign(e: DataFrame, centroids: DataFrame, narrow: bool = True) -> DataFrame:
    """The landed core path, forced narrow (the probe originally carried
    its own prototype; since the r15 core landing it exercises
    _lloyd_assign(..., narrow=True) itself)."""
    return _ORIG_ASSIGN(e, centroids, narrow=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    iters = 3
    for a in sys.argv[1:]:
        if a.startswith("--iters"):
            iters = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("probe_narrow_assign")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = S._load_embeddings(spark, sf_dir).select(
        "vec_id", S._dvec("embedding").alias("v")
    )
    seeds = S._lloyd_seeds(e)

    # --- 1. assign-level bit-identity -----------------------------------
    cur = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in S._lloyd_assign(e, seeds, narrow=False)
        .select("vec_id", "cid", "d2")
        .collect()
    }
    new = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in narrow_assign(e, seeds).select("vec_id", "cid", "d2").collect()
    }
    assert cur.keys() == new.keys(), "vec_id sets differ"
    diff = {k for k in cur if cur[k] != new[k]}
    print(f"assign bit-identity: {len(cur) - len(diff)}/{len(cur)} equal", flush=True)
    assert not diff, f"MISMATCH on {sorted(diff)[:5]}"

    # --- 2. consumer-level bit-identity (full training loop swapped) ----
    def final_assignment_narrow() -> DataFrame:
        a = narrow_assign(e, S._lloyd_seeds(e))
        c = S._lloyd_update(a)
        return narrow_assign(e, c)

    want = sorted(
        tuple(r)
        for r in S._lloyd_final_assignment(spark, sf_dir, narrow=False)
        .select("vec_id", "cid", "d2")
        .collect()
    )
    got = sorted(
        tuple(r) for r in final_assignment_narrow().select("vec_id", "cid", "d2").collect()
    )
    print(f"trained-assignment bit-identity: {'EQUAL' if got == want else 'DIFF'}", flush=True)
    assert got == want

    # --- 3. plan shape: the narrow path has zero Exchange ----------------
    plan = narrow_assign(e, seeds)._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange")
    print(f"narrow assign executedPlan Exchange count: {n_ex}", flush=True)

    # --- 4. end-to-end timing of the capstone with/without ---------------
    def run_capstone() -> float:
        t0 = time.perf_counter()
        S.sim_topk_ivf_quantized(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    base = min(run_capstone() for _ in range(iters))
    want_rows = sorted(map(tuple, S.sim_topk_ivf_quantized(spark, sf_dir).collect()))
    orig = S._lloyd_assign
    S._lloyd_assign = narrow_assign
    try:
        swapped = min(run_capstone() for _ in range(iters))
        got_rows = sorted(
            map(tuple, S.sim_topk_ivf_quantized(spark, sf_dir).collect())
        )
    finally:
        S._lloyd_assign = orig
    print(
        f"capstone rows equal under swap: {got_rows == want_rows} "
        f"({len(got_rows)} rows)",
        flush=True,
    )
    print(
        f"sim_topk_ivf_quantized end-to-end: window={base:.3f}s "
        f"narrow={swapped:.3f}s ({base / swapped:.2f}x)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
