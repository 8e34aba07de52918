"""Streaming semantics tests: stream results vs their batch twins."""

from __future__ import annotations

from multithreaded_mapreduce_library_spark.registry import load_all

SPECS = load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumbling_equals_batch(spark, sf_dir):
    """Complete-mode streaming agg over a full replay == batch windowed agg."""
    stream = SPECS["stream_tumbling"].builder(spark, sf_dir)
    batch = SPECS["time_tumbling"].builder(spark, sf_dir)
    assert _rows(stream) == _rows(batch)


def test_stream_dedup_complete_and_unique(spark, sf_dir):
    out = SPECS["stream_dedup"].builder(spark, sf_dir).collect()
    ids = [r["event_id"] for r in out]
    assert len(ids) == len(set(ids))
    # fixture has no duplicate event_ids, so dedup passes everything through
    from multithreaded_mapreduce_library_spark.sources import load_table

    assert len(ids) == load_table(spark, sf_dir, "events").count()


def test_stream_sliding_watermark_subset_of_batch(spark, sf_dir):
    """Append mode emits only watermark-finalized windows — a strict subset
    of the batch result, and every emitted window must match batch exactly."""
    stream = {(r["window_start"], r["event_type"]): r["cnt"]
              for r in SPECS["stream_sliding_watermark"].builder(spark, sf_dir).collect()}
    batch = {(r["window_start"], r["event_type"]): r["cnt"]
             for r in SPECS["time_sliding"].builder(spark, sf_dir).collect()}
    assert set(stream) <= set(batch)
    assert all(batch[k] == v for k, v in stream.items())
    assert len(stream) > 0


def test_stream_session_subset_of_batch(spark, sf_dir):
    stream = {(r["user_id"], r["session_start"]): r["n_events"]
              for r in SPECS["stream_session"].builder(spark, sf_dir).collect()}
    batch = {(r["user_id"], r["session_start"]): r["n_events"]
             for r in SPECS["sessionize"].builder(spark, sf_dir).collect()}
    assert set(stream) <= set(batch)
    assert all(batch[k] == v for k, v in stream.items())
    assert len(stream) > 0


def test_stream_stateful_running_max(spark, sf_dir):
    from pyspark.sql import functions as F

    from multithreaded_mapreduce_library_spark.sources import load_table

    out = {r["user_id"]: (r["max_value"], r["n_events"])
           for r in SPECS["stream_stateful_running_max"].builder(spark, sf_dir).collect()}
    exp = {r["user_id"]: (r["mx"], r["n"])
           for r in load_table(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(F.max("value").alias("mx"), F.count("*").alias("n"))
           .collect()}
    assert out == exp


def test_vectorized_topk_agrees_with_bruteforce(spark, sf_dir):
    """BLAS matmul path must reproduce the exact fold path: identical
    neighbor ranking, cosines within float reassociation error."""
    bf = {(r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
          for r in SPECS["sim_topk_bruteforce"].builder(spark, sf_dir).collect()}
    vec = {(r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
           for r in SPECS["sim_topk_vectorized"].builder(spark, sf_dir).collect()}
    assert set(bf) == set(vec)
    for k in bf:
        assert bf[k][0] == vec[k][0], f"neighbor ranking diverged at {k}"
        assert abs(bf[k][1] - vec[k][1]) < 1e-9
