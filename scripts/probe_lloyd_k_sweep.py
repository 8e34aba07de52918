"""K_CELLS sweep for the Lloyd core: validate the narrow-argmin literal at k >> 8.

r15 verdict "What's wrong" #4 (and next-round item 4): the narrow assign
strategy folds k x dim centroid doubles into ONE SQL literal
(operators/similarity.py::_lloyd_assign, narrow=True). At the gated k=8
that literal is constant-size and the strategy measured 1.34x faster than
the broadcast+window argmin (scripts/probe_narrow_assign.py, PERF.md r15
addendum 5). Real IVF at 100 TB wants k in the hundreds-to-thousands
(k ~ sqrt(N) cells), where the literal grows k-linear in PLAN size while
the window path grows k-linear in EXCHANGED ROWS (N*k through the
row_number window). This probe holds the corpus fixed (the 16x perturbed
fixture from scripts/scale_probe.py — 32k distinct vectors) and sweeps
K_CELLS 8 -> 64, timing BOTH strategies under the honest builder-inclusive
clock (training's eager k-row collects inside the timed region, same
protocol as bench.py's EAGER_BUILD) and re-asserting bit-identity
narrow-vs-window at every k — the agreement pin of
tests/test_plans.py::test_lloyd_narrow_assign_agrees_with_window, extended
past the gated constant.

K_CELLS is monkeypatched on the similarity module (it is read at call
time by _lloyd_seeds); no source or oracle text changes — the gated
queries and their DuckDB CTEs stay at the checked-in k=8.

What to expect (and what would falsify the narrow envelope):
- narrow plan-BUILD time grows with k (k-row collect + k x dim literal
  construction + parse) but stays driver-side constant-per-k-row;
- narrow EXECUTE time grows ~k per row (argmin over k struct terms in one
  whole-stage-codegen projection), with zero exchange at every k;
- the window path pays the N*k exchange + sort, so its total should grow
  at least as fast — if narrow ever crosses ABOVE window as k grows, the
  literal formulation has hit its envelope and the docstring's
  narrow=False fallback becomes the right default at that k.

Usage: python scripts/probe_lloyd_k_sweep.py [k ...]   (default 8 16 32 64)
Prints one JSON line; writes nothing outside /tmp.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_probe import ensure_scaled  # noqa: E402

N_COPIES = 16
ITERS = 2


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]
    scaled_dir = ensure_scaled(N_COPIES)

    from multithreaded_mapreduce_library_spark import session
    from multithreaded_mapreduce_library_spark.operators import similarity as sim

    spark = session.get_spark(app_name="lloyd_k_sweep")
    e = sim._load_embeddings(spark, scaled_dir).select(
        "vec_id", sim._dvec("embedding").alias("v")
    )
    n_rows = e.count()  # also warms the scan/session before any clock

    out: dict[str, dict] = {}
    for k in ks:
        orig = sim.K_CELLS
        sim.K_CELLS = k
        try:
            row: dict[str, float | bool] = {}
            for label, narrow in (("narrow", True), ("window", False)):
                # (total, build) recorded as a PAIR from the best-total
                # iteration — independent minima could pair a build time
                # with a total it never belonged to (ADVICE r16)
                best = (float("inf"), float("inf"))
                for _ in range(ITERS):
                    t0 = time.perf_counter()  # builder INSIDE the clock
                    df = sim._lloyd_assign(
                        e, sim._lloyd_train(e, narrow=narrow), narrow=narrow
                    )
                    t_build = time.perf_counter() - t0
                    df.write.format("noop").mode("overwrite").save()
                    best = min(best, (time.perf_counter() - t0, t_build))
                row[f"{label}_total_s"] = round(best[0], 3)
                row[f"{label}_build_s"] = round(best[1], 3)
            # bit-identity at this k (the test_plans agreement pin, swept)
            cols = ["vec_id", "cid", "d2"]
            nrows = sorted(
                map(
                    tuple,
                    sim._lloyd_assign(e, sim._lloyd_train(e, narrow=True), narrow=True)
                    .select(*cols)
                    .collect(),
                )
            )
            wrows = sorted(
                map(
                    tuple,
                    sim._lloyd_assign(
                        e, sim._lloyd_train(e, narrow=False), narrow=False
                    )
                    .select(*cols)
                    .collect(),
                )
            )
            row["agree"] = bool(nrows) and nrows == wrows
            row["cells_used"] = len({r[1] for r in nrows})
            out[str(k)] = row
        finally:
            sim.K_CELLS = orig
    print(
        json.dumps(
            {
                "n_vectors": n_rows,
                "dim": 64,
                "iters": ITERS,
                "protocol": "builder-inclusive best-of-iters, noop sink",
                "k_sweep": out,
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
