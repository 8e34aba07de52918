"""Multimodal plumbing tests: binary schema, Arrow batch shape,
determinism, the real stdlib PNG/WAV codecs, and the video decode stub."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from multithreaded_mapreduce_library_spark.operators.multimodal import (
    AUDIO_MIME,
    IMAGE_MIME,
    N_HIST_BINS,
    VIDEO_MIME,
    _feature_batches,
    attach_media,
    decode_media,
    multimodal_features,
    png_encode,
    wav_encode,
)
from multithreaded_mapreduce_library_spark.sources import load_table


def test_attach_media_schema(spark, sf_dir):
    media = attach_media(load_table(spark, sf_dir, "documents"))
    fields = dict(media.dtypes)
    assert fields["media"] == "binary"
    assert fields["meta"].startswith("struct<mime:string,byte_len:int")


def test_png_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(3)
    for shape in ((5, 7), (4, 3, 3), (2, 6, 4)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        out = decode_media(png_encode(img), IMAGE_MIME)
        assert out.shape == img.shape and (out == img).all()


def _chunk(tag: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(tag + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)


def test_png_decode_known_bytes_all_filters():
    """Decode a HAND-BUILT PNG (not one from our own encoder) whose four
    scanlines use filters Sub/Up/Average/Paeth, with the expected pixels
    worked out by hand from the PNG spec — external ground truth for the
    unfilter logic, so an encoder+decoder bug pair can't cancel out."""
    raw = (
        b"\x01" + bytes([10, 10, 10])  # Sub:     [10, 20, 30]
        + b"\x02" + bytes([5, 5, 5])   # Up:      [15, 25, 35]
        + b"\x03" + bytes([13, 8, 8])  # Average: [20, 30, 40]
        + b"\x04" + bytes([5, 5, 5])   # Paeth:   [25, 35, 45]
    )
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 4, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_media(blob, IMAGE_MIME)
    expected = np.array(
        [[10, 20, 30], [15, 25, 35], [20, 30, 40], [25, 35, 45]], dtype=np.uint8
    )
    assert (out == expected).all()


def test_png_corruption_rejected():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    blob = bytearray(png_encode(img))
    blob[20] ^= 0xFF  # flip a byte inside IHDR: CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_media(bytes(blob), IMAGE_MIME)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_media(b"\x89PNG", IMAGE_MIME)
    # truncation anywhere must raise ValueError, never escape as
    # struct.error — callers quarantine on ValueError
    full = bytes(png_encode(img))
    for cut in (9, 11, 20, len(full) - 5):
        with pytest.raises(ValueError, match="truncated|CRC|missing"):
            decode_media(full[:cut], IMAGE_MIME)


def test_wav_roundtrip():
    samples = (np.arange(100) * 997 % 65536 - 32768).astype(np.int16)
    out = decode_media(wav_encode(samples), AUDIO_MIME)
    assert out.dtype == np.int16 and (out == samples).all()


def test_video_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="stub"):
        decode_media(b"\x00\x00\x00\x18ftypmp42", VIDEO_MIME)


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


def test_mp4_metadata_roundtrip():
    from multithreaded_mapreduce_library_spark.operators.multimodal import (
        mp4_encode,
        mp4_parse_meta,
    )

    meta = mp4_parse_meta(mp4_encode(duration=4321, n_tracks=3, width=640, height=360))
    assert meta == {
        "duration": 4321,
        "timescale": 1000,
        "n_tracks": 3,
        "width": 640,
        "height": 360,
    }


def test_mp4_parser_handles_v1_and_largesize():
    """The parser must read layouts our writer doesn't emit: version-1
    mvhd/tkhd (64-bit times) and a 64-bit largesize moov header — both
    appear in real-world files (>4 GiB movies, post-2040 timestamps)."""
    from multithreaded_mapreduce_library_spark.operators.multimodal import (
        mp4_parse_meta,
    )

    def box(tag, payload, large=False):
        if large:
            return (
                struct.pack(">I", 1) + tag + struct.pack(">Q", len(payload) + 16) + payload
            )
        return struct.pack(">I", len(payload) + 8) + tag + payload

    unity = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd_v1 = box(
        b"mvhd",
        struct.pack(">I", 1 << 24)           # version 1
        + struct.pack(">QQ", 0, 0)           # 64-bit creation/modification
        + struct.pack(">IQ", 90000, 2**33)   # timescale, 64-bit duration
        + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
        + b"\x00" * 10 + unity + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd_v1 = box(
        b"tkhd",
        struct.pack(">I", (1 << 24) | 7)
        + struct.pack(">QQ", 0, 0)           # 64-bit times
        + struct.pack(">I", 1) + b"\x00" * 4
        + struct.pack(">Q", 2**33)           # 64-bit duration
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0) + unity
        + struct.pack(">II", 1920 << 16, 1080 << 16),
    )
    blob = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom") + box(
        b"moov", mvhd_v1 + box(b"trak", tkhd_v1), large=True
    )
    meta = mp4_parse_meta(blob)
    assert meta == {
        "duration": 2**33,
        "timescale": 90000,
        "n_tracks": 1,
        "width": 1920,
        "height": 1080,
    }


def test_mp4_corruption_rejected():
    from multithreaded_mapreduce_library_spark.operators.multimodal import (
        mp4_encode,
        mp4_parse_meta,
    )

    good = mp4_encode(duration=1000, n_tracks=1, width=64, height=64)
    with pytest.raises(ValueError, match="truncated|bad size"):
        mp4_parse_meta(good[:-9])          # cut inside the trailing mdat
    with pytest.raises(ValueError, match="bad size"):
        # corrupt the moov size field (bytes 24-27 = start of moov header)
        bad = bytearray(good)
        bad[24:28] = struct.pack(">I", 2**31)
        mp4_parse_meta(bytes(bad))
    with pytest.raises(ValueError, match="moov"):
        mp4_parse_meta(good[:24])          # ftyp only, no moov


def test_mp4_short_payload_with_valid_size_rejected():
    """Intra-box bounds: a box whose SIZE field is consistent with the
    stream but whose payload is too short for its fields must raise
    ValueError — not silently read the adjacent box's bytes as
    width/height, and not leak struct.error (both observed before the
    bounds checks were added)."""
    from multithreaded_mapreduce_library_spark.operators.multimodal import (
        mp4_parse_meta,
    )

    def box(tag, payload):
        return struct.pack(">I", len(payload) + 8) + tag + payload

    # tkhd with a valid size but only 12 payload bytes, followed by a
    # 'free' box whose bytes would land exactly where width/height are read
    trak = box(b"trak", box(b"tkhd", b"\x00" * 12) + box(b"free", b"\xab" * 96))
    mvhd = box(b"mvhd", b"\x00" * 100)
    with pytest.raises(ValueError, match="tkhd"):
        mp4_parse_meta(box(b"moov", mvhd + trak))
    # mvhd with a valid size but a 10-byte payload (shorter than the v0
    # timescale/duration fields)
    with pytest.raises(ValueError, match="mvhd"):
        mp4_parse_meta(box(b"moov", box(b"mvhd", b"\x00" * 10)))
    # zero-payload boxes at the very end of the stream
    with pytest.raises(ValueError, match="mvhd"):
        mp4_parse_meta(box(b"moov", box(b"mvhd", b"")))
    with pytest.raises(ValueError, match="tkhd"):
        mp4_parse_meta(box(b"moov", mvhd + box(b"trak", box(b"tkhd", b""))))


def test_video_pixel_decode_still_stubbed():
    """mp4_parse_meta handles metadata; the frame-tensor contract stays a
    labeled stub until a real demuxer/codec is installable."""
    from multithreaded_mapreduce_library_spark.operators.multimodal import mp4_encode

    blob = mp4_encode(duration=1000, n_tracks=1, width=64, height=64)
    with pytest.raises(NotImplementedError, match="stub"):
        decode_media(blob, VIDEO_MIME)


def test_mp4_roundtrip_property():
    """Property check across the writer's whole legal input space:
    encode -> parse is the identity on (duration, n_tracks, width,
    height) for any 32-bit duration, 1-64 tracks, and 16-bit dims
    (tkhd's 16.16 fixed-point integer range)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from multithreaded_mapreduce_library_spark.operators.multimodal import (
        mp4_encode,
        mp4_parse_meta,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        duration=st.integers(0, 2**32 - 1),
        n_tracks=st.integers(1, 64),
        width=st.integers(0, 2**16 - 1),
        height=st.integers(0, 2**16 - 1),
        timescale=st.integers(1, 2**32 - 1),
    )
    def check(duration, n_tracks, width, height, timescale):
        meta = mp4_parse_meta(
            mp4_encode(duration, n_tracks, width, height, timescale=timescale)
        )
        assert meta == {
            "duration": duration,
            "timescale": timescale,
            "n_tracks": n_tracks,
            "width": width,
            "height": height,
        }

    check()
