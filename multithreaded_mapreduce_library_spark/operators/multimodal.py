"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
with decode/feature-extract/frame-sample implemented as Arrow-batched
Pandas functions over ``mapInPandas`` (SURVEY.md §2.3).

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (`NotImplementedError` unless PIL/soundfile appear);
everything Spark-side — schema, binary encoding, metadata struct, batch
iteration, partitioning — is real and tested. The fixture corpus has no
binary column, so media bytes are derived deterministically from
documents.text (utf-8 encode), which also makes the metadata query
oracle-checkable in DuckDB.

Scale notes: binary payloads ride parquet as-is (no row-group bloat beyond
the bytes themselves); feature extraction is embarrassingly parallel per
Arrow batch — the shuffle-free shape you want for 100 TB of media. Column
pruning still applies: a metadata-only query never deserializes the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table

N_HIST_BINS = 16
FRAME_BYTES = 64  # fake "frame" granularity for frame sampling

# THE mime assignment rule: doc_id % 3 → mime. Single source of truth for
# every Spark builder (``mime_col``) and every DuckDB oracle
# (``DUCK_MIME_CASE``, f-string'd into the SQL) — a drift between the two
# sides would surface as a confusing driver hash mismatch.
MIME_BY_MOD = ("image/png", "audio/wav", "video/mp4")
IMAGE_MIME, AUDIO_MIME, VIDEO_MIME = MIME_BY_MOD

DUCK_MIME_CASE = (
    f"CASE WHEN doc_id % 3 = 0 THEN '{MIME_BY_MOD[0]}'\n"
    f"            WHEN doc_id % 3 = 1 THEN '{MIME_BY_MOD[1]}'\n"
    f"            ELSE '{MIME_BY_MOD[2]}' END"
)


def mime_col() -> Column:
    """Spark-side expression of the ``MIME_BY_MOD`` rule."""
    return (
        F.when(F.col("doc_id") % 3 == 0, MIME_BY_MOD[0])
        .when(F.col("doc_id") % 3 == 1, MIME_BY_MOD[1])
        .otherwise(MIME_BY_MOD[2])
    )


def attach_media(docs: DataFrame) -> DataFrame:
    """Add an opaque binary payload + typed metadata struct to documents.

    ``media`` is the utf-8 encoding of the text (deterministic stand-in for
    real image/audio bytes); ``meta`` carries the typed sidecar a real
    pipeline stores next to the blob (mime, nominal dims, byte length).
    """
    mime = mime_col()
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.struct(
            mime.alias("mime"),
            F.octet_length("text").alias("byte_len"),
            (F.pmod(F.col("doc_id") * 37 + 11, F.lit(1024)) + 16).alias("width"),
            (F.pmod(F.col("doc_id") * 53 + 7, F.lit(768)) + 16).alias("height"),
        ).alias("meta"),
    )


def decode_media(blob: bytes, mime: str):
    """STUB: real decode requires codec libraries absent from this
    container. The Spark-side contract (bytes + mime in, decoded tensor
    out) is what matters; swap in PIL/soundfile/pyav in a real deployment.
    """
    try:
        if mime == IMAGE_MIME:
            from PIL import Image  # noqa: F401
        elif mime == AUDIO_MIME:
            import soundfile  # noqa: F401
        else:
            import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"decode_media({mime}): codec library not available in this "
            "environment — plumbing is real, decode is stubbed"
        ) from exc
    raise NotImplementedError("codec present but decode intentionally stubbed in v1")


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("histogram", T.ArrayType(T.DoubleType()), False),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction: byte histogram (the deterministic
    stand-in for a decoded-pixel feature) + frame count at FRAME_BYTES
    granularity. Vectorized numpy per batch — no per-row Python."""
    import numpy as np

    for pdf in batches:
        out = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            arr = np.frombuffer(blob, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=N_HIST_BINS).astype("float64")
            total = max(len(arr), 1)
            # fixed-point quantization (floor(x*1e6 + 0.5)/1e6), NOT
            # np.round: numpy rounds half-even, SQL rounds half-away —
            # the shared floor form is bit-identical to the DuckDB oracle
            ratios = np.floor(hist / total * 1_000_000 + 0.5) / 1_000_000
            out.append(
                (
                    int(doc_id),
                    int(len(arr)),
                    int(-(-len(arr) // FRAME_BYTES)),
                    ratios.tolist(),
                )
            )
        yield pd.DataFrame(out, columns=["doc_id", "byte_len", "n_frames", "histogram"])


@register(
    "multimodal_metadata",
    oracle=f"""
SELECT doc_id,
       {DUCK_MIME_CASE} AS mime,
       octet_length(encode(text)) AS byte_len,
       ((doc_id * 37 + 11) % 1024 + 16) AS width,
       ((doc_id * 53 + 7) % 768 + 16) AS height
FROM documents
""",
    tags=("multimodal", "llm-pipeline"),
    doc=(
        "Typed metadata projection over the media table — reads only the "
        "metadata struct, never the blob (column pruning keeps 100 TB of "
        "payload bytes out of the scan)."
    ),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.byte_len").cast("long").alias("byte_len"),
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
    )


_FEATURES_ORACLE = f"""
WITH m AS (
  SELECT doc_id, lower(hex(encode(text))) AS bh, octet_length(encode(text)) AS n
  FROM documents
),
hn AS (
  SELECT doc_id, n,
         list_transform(generate_series(1, n), i -> substr(bh, 2 * i - 1, 1)) AS nibbles
  FROM m
),
h AS (
  SELECT doc_id, n,
         list_transform(
           ['0','1','2','3','4','5','6','7','8','9','a','b','c','d','e','f'],
           d -> floor(len(list_filter(nibbles, c -> c = d)) / CAST(greatest(n, 1) AS DOUBLE)
                      * 1000000 + 0.5) / 1000000
         ) AS hist
  FROM hn
)
SELECT doc_id,
       {DUCK_MIME_CASE} AS mime,
       n AS byte_len,
       CAST(ceil(n / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
       CAST(generate_subscripts(hist, 1) - 1 AS BIGINT) AS bin,
       unnest(hist) AS ratio
FROM h
"""


@register(
    "multimodal_features",
    oracle=_FEATURES_ORACLE,
    tags=("multimodal", "pandas-udf", "llm-pipeline"),
    doc=(
        "Feature extraction over binary media via mapInPandas (Arrow "
        "batches): high-nibble byte histogram + frame count per document, "
        "exploded to one (doc_id, bin, ratio) row per histogram bucket — "
        "scalar columns only, so the result is sortable/hashable by any "
        "pandas-style canonicalizer (array-valued outputs are rejected by "
        "tests/oracle.py for exactly this reason). The real decode hook is "
        "decode_media (stubbed). Oracle-gated despite the numpy path: the "
        "ratios are fixed-point-quantized with the shared floor form and "
        "the oracle recomputes them from hex-nibble counts — the UDF's "
        "Arrow plumbing is verified value-for-value, not just rows-only."
    ),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle story: zero exchanges — mapInPandas is narrow, the
    histogram posexplode is a map-side fan-out (16 rows/doc), and mime is
    derived from doc_id arithmetic rather than a join back to metadata.
    100 TB: blob bytes never cross an exchange; output is 16 scalar
    rows/doc regardless of media size."""
    media = attach_media(load_table(spark, sf_dir, "documents"))
    feats = media.select("doc_id", "media").mapInPandas(_feature_batches, FEATURE_SCHEMA)
    mime = mime_col()
    return feats.select(
        "doc_id",
        mime.alias("mime"),
        "byte_len",
        "n_frames",
        F.posexplode("histogram").alias("bin", "ratio"),
    ).withColumn("bin", F.col("bin").cast("long"))


FRAME_SAMPLE_EVERY = 4

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampling: every FRAME_SAMPLE_EVERY-th
    FRAME_BYTES-sized block of the blob, identified by its md5 (the
    deterministic stand-in for a decoded frame tensor)."""
    import hashlib

    for pdf in batches:
        out = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            b = bytes(blob)
            n_frames = -(-len(b) // FRAME_BYTES)
            for i in range(0, n_frames, FRAME_SAMPLE_EVERY):
                # frame identity = md5 of the frame's lowercase hex dump —
                # SQL-reproducible (DuckDB can't md5 a sliced BLOB, but
                # slicing the hex string is byte-exact on both engines)
                frame_hex = b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES].hex()
                out.append(
                    (int(doc_id), i, hashlib.md5(frame_hex.encode()).hexdigest())
                )
        yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_md5"])


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH frames AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT) - 1)) AS frame_idx,
         lower(hex(encode(text))) AS blob_hex
  FROM documents
)
SELECT doc_id, frame_idx,
       md5(substring(blob_hex, frame_idx * {2 * FRAME_BYTES} + 1, {2 * FRAME_BYTES})) AS frame_md5
FROM frames
WHERE frame_idx % {FRAME_SAMPLE_EVERY} = 0
""",
    tags=("multimodal", "pandas-udf", "frame-sample", "llm-pipeline"),
    doc=(
        "Frame sampling over binary media via mapInPandas: every 4th "
        "64-byte block, identified by md5 — the video frame-sample "
        "plumbing (batch shape, schema, fan-out) with a deterministic "
        "fake decode, oracle-checked byte-for-byte against SQL blob "
        "slicing."
    ),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle story: pure map-side fan-out (one input row → n_frames/4
    output rows) inside a single mapInPandas pass — no exchange at all;
    downstream consumers shuffle on (doc_id, frame_idx) only if they
    aggregate. 100 TB: frames never leave the executor that read the
    blob; sampling rate bounds the fan-out.
    """
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return media.select("doc_id", "media").mapInPandas(
        _frame_sample_batches, FRAME_SAMPLE_SCHEMA
    )


RESIZE_FACTOR = 4  # keep every 4th byte — deterministic stand-in for a
# pixel-domain downscale (the real hook would decode, cv2/PIL-resize,
# re-encode inside the same batch loop)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("orig_len", T.LongType(), False),
        T.StructField("resized_len", T.LongType(), False),
        T.StructField("resized_md5", T.StringType(), False),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched resize: strided byte downsample of the blob; identity
    of the resized payload = md5 of its hex dump (SQL-reproducible, like
    the frame sampler)."""
    import hashlib

    for pdf in batches:
        out = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            b = bytes(blob)
            rb = b[::RESIZE_FACTOR]
            out.append(
                (
                    int(doc_id),
                    len(b),
                    len(rb),
                    hashlib.md5(rb.hex().encode()).hexdigest(),
                )
            )
        yield pd.DataFrame(out, columns=["doc_id", "orig_len", "resized_len", "resized_md5"])


@register(
    "multimodal_resize",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         lower(hex(encode(text))) AS bh,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id,
       {DUCK_MIME_CASE} AS mime,
       n AS orig_len,
       CAST(ceil(n / {RESIZE_FACTOR}.0) AS BIGINT) AS resized_len,
       greatest(((doc_id * 37 + 11) % 1024 + 16) // 2, 1) AS new_width,
       greatest(((doc_id * 53 + 7) % 768 + 16) // 2, 1) AS new_height,
       md5(array_to_string(
         list_transform(generate_series(0, CAST(ceil(n / {RESIZE_FACTOR}.0) AS BIGINT) - 1),
                        k -> substr(bh, k * {2 * RESIZE_FACTOR} + 1, 2)), '')) AS resized_md5
FROM m
""",
    tags=("multimodal", "pandas-udf", "resize", "llm-pipeline"),
    doc=(
        f"Media resize plumbing via mapInPandas: strided 1/{RESIZE_FACTOR} "
        "byte downsample of every blob (deterministic stand-in for a "
        "pixel-domain resize — the real decode/resize/re-encode swaps into "
        "the same batch loop), plus halved nominal dimensions in the "
        "metadata sidecar. Oracle-checked byte-for-byte against SQL "
        "hex-slicing. Shuffle story: the resize itself is NARROW (blob in, "
        "blob stats out, same partition); only the broadcast metadata "
        "enrich joins — at 100 TB payload bytes never cross an exchange."
    ),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(load_table(spark, sf_dir, "documents"))
    resized = media.select("doc_id", "media").mapInPandas(_resize_batches, RESIZE_SCHEMA)
    meta = multimodal_metadata(spark, sf_dir).select("doc_id", "mime", "width", "height")
    return resized.join(F.broadcast(meta), "doc_id").select(
        "doc_id",
        "mime",
        "orig_len",
        "resized_len",
        F.greatest(F.floor(F.col("width") / 2), F.lit(1)).cast("long").alias("new_width"),
        F.greatest(F.floor(F.col("height") / 2), F.lit(1)).cast("long").alias("new_height"),
        "resized_md5",
    )
