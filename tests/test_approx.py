"""Approximate aggregates bounded against their exact twins."""

from __future__ import annotations

from multithreaded_mapreduce_library_spark.registry import load_all

SPECS = load_all()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = {r["o_orderstatus"]: r["approx_customers"]
              for r in SPECS["approx_count_distinct"].builder(spark, sf_dir).collect()}
    exact = {r["o_orderstatus"]: r["n_customers"]
             for r in SPECS["count_distinct"].builder(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.02 * exact[k]), (
            k, approx[k], exact[k]
        )


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    approx = {r["o_orderpriority"]: (r["p25"], r["p50"], r["p90"])
              for r in SPECS["approx_percentiles"].builder(spark, sf_dir).collect()}
    exact = {r["o_orderpriority"]: (r["p25"], r["p50"], r["p90"])
             for r in SPECS["percentiles"].builder(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            # approx_percentile returns an actual data point near the
            # quantile; with small groups allow a generous relative band
            assert abs(a - e) <= 0.05 * max(abs(e), 1.0) + 5000, (k, a, e)
