"""Multimodal plumbing tests: binary schema, Arrow batch shape,
determinism, and the clearly-marked decode stub."""

from __future__ import annotations

import pandas as pd
import pytest

from multithreaded_mapreduce_library_spark.operators.multimodal import (
    N_HIST_BINS,
    _feature_batches,
    attach_media,
    decode_media,
    multimodal_features,
)
from multithreaded_mapreduce_library_spark.sources import load_table


def test_attach_media_schema(spark, sf_dir):
    media = attach_media(load_table(spark, sf_dir, "documents"))
    fields = dict(media.dtypes)
    assert fields["media"] == "binary"
    assert fields["meta"].startswith("struct<mime:string,byte_len:int")


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="stub"):
        decode_media(b"\x89PNG", "image/png")


def test_feature_batches_pure():
    pdf = pd.DataFrame({"doc_id": [1, 2], "media": [b"abcd" * 32, b""]})
    out = list(_feature_batches(iter([pdf])))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["byte_len"] == 128
    assert row["n_frames"] == 2
    assert len(row["histogram"]) == N_HIST_BINS
    assert abs(sum(row["histogram"]) - 1.0) < 1e-6
    # empty blob: zero-safe
    assert out[0].iloc[1]["byte_len"] == 0


def test_features_deterministic(spark, sf_dir):
    a = {(r["doc_id"], r["bin"]): (r["byte_len"], r["ratio"]) for r in
         multimodal_features(spark, sf_dir).collect()}
    b = {(r["doc_id"], r["bin"]): (r["byte_len"], r["ratio"]) for r in
         multimodal_features(spark, sf_dir).collect()}
    assert a == b
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(a) == n_docs * N_HIST_BINS


def test_features_scalar_schema(spark, sf_dir):
    # the driver's pandas canonicalizer cannot sort/hash list columns —
    # the exploded shape must stay scalar-only (regression for r3 red row)
    for _, dtype in multimodal_features(spark, sf_dir).dtypes:
        assert not dtype.startswith(("array", "map", "struct")), dtype
