"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
with decode/feature-extract/frame-sample implemented as Arrow-batched
Pandas functions over ``mapInPandas`` (SURVEY.md §2.3).

The container has no installable codec libraries (PIL/soundfile/av absent,
pip disallowed), so PNG and WAV decode are implemented for real on stdlib
only (zlib chunk/filter PNG, wave-module PCM — see png_encode/_png_decode/
wav_encode/_wav_decode), video METADATA parses for real through an ISO
BMFF box walker (mp4_encode/mp4_parse_meta: mvhd duration/timescale, trak
count, tkhd 16.16 dimensions), and all three are exercised end-to-end by
the oracle-gated ``multimodal_decode`` query; only video PIXEL decode
remains a clearly-marked stub (no stdlib demuxer/codec). The fixture
corpus has no binary column, so media bytes are derived deterministically
from documents.text (utf-8 encode) — or synthesized as real PNG/WAV/MP4
blobs from doc_id arithmetic in the decode query — which keeps every
query oracle-checkable in DuckDB.

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


def png_encode(arr) -> bytes:
    """Minimal PNG writer (stdlib zlib only): 8-bit grayscale (h, w),
    RGB (h, w, 3) or RGBA (h, w, 4), non-interlaced, filter 0 per row."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        color_type, channels = (2, 3) if a.shape[2] == 3 else (6, 4)
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_decode(blob: bytes):
    """Minimal PNG reader (stdlib zlib only): 8-bit depth, grayscale/RGB/
    RGBA, non-interlaced; implements all five scanline filters. Returns a
    uint8 array of shape (h, w) or (h, w, channels)."""
    import struct
    import zlib

    import numpy as np

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG byte stream")
    pos, ihdr, idat = 8, None, []
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("PNG truncated inside a chunk header")
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        if pos + 12 + length > len(blob):
            raise ValueError(f"PNG truncated inside chunk {tag!r}")
        data = blob[pos + 8 : pos + 8 + length]
        if zlib.crc32(tag + data) & 0xFFFFFFFF != struct.unpack(
            ">I", blob[pos + 8 + length : pos + 12 + length]
        )[0]:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if depth != 8 or channels is None or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color_type} "
            f"interlace={interlace}); this decoder handles 8-bit "
            "gray/RGB/RGBA non-interlaced"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    bpp = channels  # bytes per pixel at 8-bit depth
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a left-to-right scan
            cur = row.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                up = int(prev[i])
                if f == 1:
                    cur[i] = (cur[i] + left) & 0xFF
                elif f == 3:
                    cur[i] = (cur[i] + ((left + up) >> 1)) & 0xFF
                else:
                    ul = int(prev[i - bpp]) if i >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                    cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[r] = cur.astype(np.uint8)
        prev = out[r]
    return out.reshape((h, w)) if channels == 1 else out.reshape((h, w, channels))


def wav_encode(samples, rate: int = 16_000) -> bytes:
    """Minimal mono 16-bit PCM WAV writer (stdlib wave module)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def _wav_decode(blob: bytes):
    """Minimal WAV reader (stdlib wave module): mono/stereo 16-bit PCM.
    Returns an int16 array of shape (n_frames,) or (n_frames, channels)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(blob), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV sample width {f.getsampwidth()}; this "
                "decoder handles 16-bit PCM"
            )
        data = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
        ch = f.getnchannels()
    return data if ch == 1 else data.reshape(-1, ch)


def mp4_encode(
    duration: int, n_tracks: int, width: int, height: int, timescale: int = 1000
) -> bytes:
    """Minimal ISO BMFF (MP4) writer, stdlib struct only: ftyp + moov
    (mvhd v0 + one tkhd-bearing trak per track) + a stub mdat. The box
    layout is real — 32-bit size + fourcc headers, version/flags fields,
    16.16 fixed-point tkhd dimensions, identity matrices — so a parser
    exercised against it must get every offset right; only the media
    payload is absent (no codec in this environment, and the metadata
    level is the honest scope: see mp4_parse_meta)."""
    import struct

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + tag + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp42")
    unity = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification time
        + struct.pack(">II", timescale, duration)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + unity
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", n_tracks + 1),  # next_track_ID
    )
    traks = b""
    for track_id in range(1, n_tracks + 1):
        tkhd = box(
            b"tkhd",
            struct.pack(">I", 7)  # version 0 + flags: enabled|in_movie|in_preview
            + struct.pack(">II", 0, 0)  # creation/modification time
            + struct.pack(">I", track_id)
            + b"\x00" * 4  # reserved
            + struct.pack(">I", duration)
            + b"\x00" * 8  # reserved
            + struct.pack(">hhhh", 0, 0, 0, 0)  # layer/alt_group/volume/reserved
            + unity
            + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
        )
        traks += box(b"trak", tkhd)
    moov = box(b"moov", mvhd + traks)
    mdat = box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat


def mp4_parse_meta(blob: bytes) -> dict:
    """Minimal ISO BMFF (MP4) box parser, stdlib struct only: walks the
    top-level box sequence (32-bit sizes, size==1 largesize, size==0
    to-end-of-file), descends into moov, and reads mvhd (version 0 AND 1
    layouts) for timescale/duration, counts trak boxes, and decodes the
    first tkhd's 16.16 fixed-point width/height. This is the metadata
    level of video decode — duration, track count, dimensions — done for
    real; pixel/frame decode stays honestly stubbed in decode_media (no
    stdlib demuxer or codec exists). Every size field is validated, so a
    truncated or corrupt stream raises ValueError instead of misreading."""
    import struct

    def walk(start: int, end: int):
        pos = start
        while pos < end:
            if pos + 8 > end:
                raise ValueError("MP4 truncated inside a box header")
            (size,) = struct.unpack(">I", blob[pos : pos + 4])
            tag = blob[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    raise ValueError("MP4 truncated inside a largesize header")
                (size,) = struct.unpack(">Q", blob[pos + 8 : pos + 16])
                hdr = 16
            elif size == 0:  # box extends to end of enclosing scope
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError(f"MP4 box {tag!r}: bad size {size}")
            yield tag, pos + hdr, pos + size
            pos += size

    moov_span = None
    for tag, s, e in walk(0, len(blob)):
        if tag == b"moov":
            moov_span = (s, e)
    if moov_span is None:
        raise ValueError("MP4 missing moov box")
    timescale = duration = width = height = None
    n_tracks = 0
    for tag, s, e in walk(*moov_span):
        if tag == b"mvhd":
            # intra-box bounds: a box SIZE can be valid while the payload
            # is too short for the fields — unpack on a short slice would
            # raise struct.error (not ValueError) or, worse, a field read
            # past the box end would silently pull bytes from the NEXT box
            if s >= e:
                raise ValueError("MP4 mvhd has empty payload")
            if blob[s] == 1:  # version 1: 64-bit times
                if s + 32 > e:
                    raise ValueError("MP4 mvhd (v1) payload too short")
                timescale, duration = struct.unpack(">IQ", blob[s + 20 : s + 32])
            else:
                if s + 20 > e:
                    raise ValueError("MP4 mvhd (v0) payload too short")
                timescale, duration = struct.unpack(">II", blob[s + 12 : s + 20])
        elif tag == b"trak":
            n_tracks += 1
            for t2, s2, e2 in walk(s, e):
                if t2 == b"tkhd" and width is None:
                    if s2 >= e2:
                        raise ValueError("MP4 tkhd has empty payload")
                    # width/height trail the 36-byte matrix; offsets differ
                    # between v0 (32-bit times) and v1 (64-bit times)
                    off = s2 + (88 if blob[s2] == 1 else 76)
                    if off + 8 > e2:
                        raise ValueError("MP4 tkhd payload too short")
                    w16, h16 = struct.unpack(">II", blob[off : off + 8])
                    width, height = w16 >> 16, h16 >> 16
    if timescale is None:
        raise ValueError("MP4 moov missing mvhd")
    return {
        "duration": duration,
        "timescale": timescale,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def decode_media(blob: bytes, mime: str):
    """Decode a media blob to a numpy array.

    PNG (8-bit gray/RGB/RGBA, non-interlaced) and 16-bit PCM WAV decode
    for real via stdlib-only codecs above — the environment rejects
    pip installs (checked 2026-08-13: PIL/soundfile/av all absent, no
    package installation permitted), so the pure-Python path IS the
    production path here; a real deployment would swap PIL/soundfile for
    throughput, keeping this as the fallback. Video METADATA (duration,
    timescale, track count, dimensions) parses for real via
    mp4_parse_meta's box walker; PIXEL decode for video stays a clearly
    marked stub — there is no stdlib demuxer/codec, so this contract
    (bytes + mime in, frame tensor out) raises until PyAV is available.
    """
    if mime == IMAGE_MIME:
        return _png_decode(blob)
    if mime == AUDIO_MIME:
        return _wav_decode(blob)
    try:
        import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"decode_media({mime}): no stdlib demuxer for video and PyAV "
            "is not installable in this environment — plumbing is real, "
            "video decode is stubbed"
        ) from exc
    raise NotImplementedError("PyAV present but video decode intentionally stubbed")


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


# --- real codec round-trip (oracle-gated) ----------------------------------
# Synthetic media content defined by pure doc_id arithmetic, so the oracle
# can compute the decoded-value statistics symbolically while Spark earns
# them the hard way: encode a real PNG/WAV/MP4 blob, decode it with the
# real stdlib codec/parser, aggregate the decoded values. An encoder OR
# decoder bug (chunk layout, CRC, scanline filters, PCM byte order, box
# sizes, 16.16 fixed-point) breaks the hash. Video rows cover the
# METADATA level (mvhd/tkhd fields round-tripped through real ISO BMFF
# boxes) — the honest scope without a codec.
DECODE_PNG_W, DECODE_PNG_H = 8, 4        # 32 gray pixels per image doc
DECODE_WAV_N = 64                         # 64 int16 samples per audio doc
DECODE_MP4_N = 4                          # duration, n_tracks, width, height


def _mp4_meta_rule(doc_id: int) -> tuple[int, int, int, int]:
    """doc_id -> (duration, n_tracks, width, height): the ONE definition
    of the synthetic video metadata, mirrored symbolically in the oracle
    SQL below. width/height reuse attach_media's meta formulas."""
    return (
        (doc_id * 11) % 90000 + 1000,
        (doc_id % 5) % 3 + 1,
        (doc_id * 37 + 11) % 1024 + 16,
        (doc_id * 53 + 7) % 768 + 16,
    )

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_values", T.LongType(), False),
        T.StructField("val_sum", T.LongType(), False),
        T.StructField("val_min", T.LongType(), False),
        T.StructField("val_max", T.LongType(), False),
    ]
)


def _decode_stat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            if doc_id % 3 == 0:
                n = DECODE_PNG_W * DECODE_PNG_H
                pix = ((doc_id * 7 + np.arange(n) * 13) % 256).astype(np.uint8)
                blob = png_encode(pix.reshape(DECODE_PNG_H, DECODE_PNG_W))
                vals = decode_media(blob, IMAGE_MIME).ravel().astype(np.int64)
                mime = IMAGE_MIME
            elif doc_id % 3 == 1:
                samples = (
                    (doc_id * 31 + np.arange(DECODE_WAV_N) * 17) % 65536 - 32768
                ).astype(np.int16)
                blob = wav_encode(samples)
                vals = decode_media(blob, AUDIO_MIME).astype(np.int64)
                mime = AUDIO_MIME
            else:
                duration, n_tracks, width, height = _mp4_meta_rule(doc_id)
                blob = mp4_encode(duration, n_tracks, width, height)
                meta = mp4_parse_meta(blob)
                vals = np.array(
                    [meta["duration"], meta["n_tracks"], meta["width"], meta["height"]],
                    dtype=np.int64,
                )
                mime = VIDEO_MIME
            out.append(
                (doc_id, mime, len(vals), int(vals.sum()), int(vals.min()), int(vals.max()))
            )
        yield pd.DataFrame(
            out,
            columns=["doc_id", "mime", "n_values", "val_sum", "val_min", "val_max"],
        )


@register(
    "multimodal_decode",
    oracle=f"""
WITH vals AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN (doc_id * 7 + i * 13) % 256
              WHEN doc_id % 3 = 1 THEN (doc_id * 31 + i * 17) % 65536 - 32768
              ELSE CASE i WHEN 0 THEN (doc_id * 11) % 90000 + 1000
                          WHEN 1 THEN (doc_id % 5) % 3 + 1
                          WHEN 2 THEN (doc_id * 37 + 11) % 1024 + 16
                          ELSE (doc_id * 53 + 7) % 768 + 16 END
         END AS v
  FROM documents CROSS JOIN unnest(generate_series(0, {DECODE_WAV_N - 1})) AS t(i)
  WHERE (doc_id % 3 = 1)
     OR (doc_id % 3 = 0 AND i < {DECODE_PNG_W * DECODE_PNG_H})
     OR (doc_id % 3 = 2 AND i < {DECODE_MP4_N})
)
SELECT doc_id,
       {DUCK_MIME_CASE} AS mime,
       CAST(count(*) AS BIGINT) AS n_values,
       CAST(sum(v) AS BIGINT) AS val_sum,
       min(v) AS val_min,
       max(v) AS val_max
FROM vals
GROUP BY doc_id
""",
    tags=("multimodal", "decode", "pandas-udf", "llm-pipeline"),
    doc=(
        "REAL media decode over mapInPandas: per doc, build a "
        f"{DECODE_PNG_W}x{DECODE_PNG_H} grayscale PNG / {DECODE_WAV_N}-sample "
        "16-bit PCM WAV / multi-track ISO-BMFF MP4 whose content is doc_id "
        "arithmetic, round-trip it through the stdlib-only codecs (zlib "
        "chunk+filter PNG, wave-module PCM, struct box-walker MP4), and "
        "aggregate the DECODED values. The oracle computes the same "
        "statistics symbolically from the arithmetic — so a codec bug "
        "anywhere (chunk layout, CRC, scanline unfilter, byte order, box "
        "sizes, 16.16 fixed-point) is a driver hash mismatch, not a silent "
        "pass. Video rows cover the METADATA level (mvhd duration, trak "
        "count, tkhd dimensions through real boxes); pixel/frame decode "
        "for video remains the one honestly-labeled stub (no stdlib "
        "demuxer/codec; decode_media documents it). Shuffle story: zero "
        "exchanges beyond one optional round-robin rebalance of bare "
        "doc_ids — blobs are created, decoded, and reduced to 4 scalars "
        "inside one task; at 100 TB no payload byte ever crosses the wire."
    ),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from multithreaded_mapreduce_library_spark.sources.tables import rebalance_scan

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return rebalance_scan(docs, spark).mapInPandas(_decode_stat_batches, DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# audio frame features (real WAV round-trip -> per-frame signal stats)
# ---------------------------------------------------------------------------

AUDIO_FRAME = 16  # samples per analysis frame (DECODE_WAV_N / 4 frames/doc)

AUDIO_FRAME_SCHEMA = (
    "doc_id long, frame long, energy long, peak long, zero_crossings long"
)


def _audio_frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            samples = (
                (d * 31 + np.arange(DECODE_WAV_N) * 17) % 65536 - 32768
            ).astype(np.int16)
            v = decode_media(wav_encode(samples), AUDIO_MIME).astype(np.int64)
            for f in range(DECODE_WAV_N // AUDIO_FRAME):
                s = v[f * AUDIO_FRAME : (f + 1) * AUDIO_FRAME]
                neg = s < 0
                rows.append(
                    (
                        d,
                        f,
                        int((s * s).sum()),
                        int(np.abs(s).max()),
                        int(np.count_nonzero(neg[1:] != neg[:-1])),
                    )
                )
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame", "energy", "peak", "zero_crossings"]
        )


@register(
    "audio_frame_features",
    oracle=f"""
WITH s AS (
  SELECT doc_id, t.i AS i, ((doc_id * 31 + t.i * 17) % 65536 - 32768) AS v
  FROM documents, LATERAL (SELECT unnest(generate_series(0, {DECODE_WAV_N - 1})) AS i) t
  WHERE doc_id % 3 = 1
), w AS (
  SELECT doc_id, i // {AUDIO_FRAME} AS frame, i, v,
         lag(v) OVER (PARTITION BY doc_id, i // {AUDIO_FRAME} ORDER BY i) AS pv
  FROM s
)
SELECT doc_id, frame,
       CAST(sum(v * v) AS BIGINT) AS energy,
       max(abs(v)) AS peak,
       CAST(count(*) FILTER (WHERE pv IS NOT NULL AND ((pv < 0) <> (v < 0)))
            AS BIGINT) AS zero_crossings
FROM w GROUP BY doc_id, frame
""",
    tags=("multimodal", "audio", "features", "pandas-udf", "llm-pipeline"),
    doc=(
        f"Per-frame audio signal features over the REAL WAV path: each "
        f"audio doc's {DECODE_WAV_N}-sample PCM is encoded and decoded "
        "through the stdlib wave codec, then framed into "
        f"{AUDIO_FRAME}-sample windows with integer energy (sum of "
        "squares), peak amplitude and zero-crossing count — the "
        "filtering primitives an audio curation pipeline gates on "
        "(silence/clipping detection). All-integer math (int16 samples, "
        "int64 sums) so the oracle — which recomputes the statistics "
        "symbolically from the sample arithmetic WITHOUT the codec — is "
        "exact: any codec bug (byte order, sample width, truncation) is "
        "a driver hash mismatch. Shuffle story: zero exchanges — the "
        "audio-doc filter rides the scan (JVM-side pmod, non-audio rows "
        "never reach Python), and each blob is built, decoded, framed "
        "and reduced inside one task; at 100 TB no payload byte crosses "
        "the wire."
    ),
)
def audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from multithreaded_mapreduce_library_spark.sources.tables import rebalance_scan

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.pmod("doc_id", F.lit(3)) == 1)
    )
    return rebalance_scan(docs, spark).mapInPandas(
        _audio_frame_batches, AUDIO_FRAME_SCHEMA
    )
