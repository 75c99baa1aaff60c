"""Multimodal plumbing units: exact byte round-trips through the
mapInPandas stages, frame sampling arithmetic, and the codec stub gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.multimodal import (
    decode_features,
    fake_image_table,
    require_codec,
    resize_images,
    sample_frames,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    base = load_table(spark, SF_DIR_SMOKE, "customer").filter(
        F.col("c_custkey") % 10 == 0
    )
    return fake_image_table(base, "c_custkey")


def test_content_bytes_exact(media):
    row = media.filter(F.col("media_id") == 100).collect()[0]
    v, w, h = 100 % 251, 100 % 8 + 2, 100 % 5 + 2
    assert bytes(row["content"]) == bytes([v]) * (w * h)
    assert row["meta"]["width"] == w and row["meta"]["height"] == h


def test_decode_features_values(media):
    feats = {r["media_id"]: r for r in decode_features(media).collect()}
    for k, r in feats.items():
        v = k % 251
        assert r["n_bytes"] == r["width"] * r["height"]
        assert r["mean_byte"] == float(v)
        assert r["min_byte"] == v and r["max_byte"] == v


def test_resize_shapes_and_values(media):
    resized = resize_images(media, 3, 3)
    rows = resized.collect()
    for r in rows:
        assert r["meta"]["width"] == 3 and r["meta"]["height"] == 3
        assert len(bytes(r["content"])) == 9
        assert set(bytes(r["content"])) == {r["media_id"] % 251}


def test_sample_frames(spark):
    base = load_table(spark, SF_DIR_SMOKE, "customer").filter(
        F.col("c_custkey") == 40
    )
    # 40 -> w=2,h=2 -> 4-byte buffer; treat as 4 frames of 1 byte
    media = fake_image_table(base, "c_custkey")
    frames = sample_frames(media, n_frames=4, every_k=2).collect()
    assert [f["frame_idx"] for f in frames] == [0, 2]
    assert all(len(bytes(f["frame"])) == 1 for f in frames)


def test_codec_stub_gate():
    decode = require_codec("raw")
    assert list(decode(b"\x01\x02")) == [1, 2]
    with pytest.raises(NotImplementedError):
        require_codec("mp4")
    # jpeg: either PIL is present (callable) or a clear stub error
    try:
        assert callable(require_codec("jpeg"))
    except NotImplementedError as exc:
        assert "Pillow" in str(exc)


def test_decode_ppm_parses_header_and_pixels():
    import numpy as np

    from nosql_to_sql_migration_tool_spark.operators.multimodal import (
        decode_ppm,
    )

    buf = b"P6\n# a comment\n3 2\n255\n" + bytes([10, 20, 30] * 6)
    img = decode_ppm(buf)
    assert img.shape == (2, 3, 3)
    assert img[0, 0].tolist() == [10, 20, 30]
    assert np.all(img.reshape(-1, 3) == [10, 20, 30])
    with pytest.raises(ValueError, match="truncated pixel"):
        decode_ppm(b"P6\n3 2\n255\n" + bytes(5))
    with pytest.raises(ValueError, match="bad magic"):
        decode_ppm(b"P5\n3 2\n255\n" + bytes(6))
    with pytest.raises(ValueError, match="truncated header"):
        decode_ppm(b"P6\n3 2")


def test_decode_wav_walks_chunks_and_signs():
    import struct

    from nosql_to_sql_migration_tool_spark.operators.multimodal import (
        decode_wav,
    )

    data = struct.pack("<4h", -300, 300, 7, -7)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    odd = b"abcde"  # 5-byte chunk forces word-align skip
    wav = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    samples, rate = decode_wav(wav)
    assert rate == 8000
    assert samples.tolist() == [-300, 300, 7, -7]
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"JUNK")
    bad_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)  # float PCM
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
            + b"data" + struct.pack("<I", 0)
        )


def test_ppm_and_wav_fixture_bytes_roundtrip(spark):
    """The JVM-generated PPM/WAV fixtures must be REAL files: python-side
    decode of the exact bytes recovers dimensions, rates and values."""
    from nosql_to_sql_migration_tool_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
        ppm_image_table,
        wav_audio_table,
    )

    base = load_table(spark, SF_DIR_SMOKE, "customer").filter(
        F.col("c_custkey").isin([40, 57])
    )
    for row in ppm_image_table(base, "c_custkey").collect():
        k = row["media_id"]
        img = decode_ppm(bytes(row["content"]))
        assert img.shape == (k % 3 + 2, k % 4 + 2, 3)
        assert img[0, 0].tolist() == [k % 251, (7 * k) % 251, (13 * k) % 251]
    for row in wav_audio_table(base, "c_custkey").collect():
        k = row["media_id"]
        samples, rate = decode_wav(bytes(row["content"]))
        assert rate == 8000
        assert len(samples) == k % 50 + 10
        assert set(samples.tolist()) == {k % 800}


def test_require_codec_dispatches_real_decoders():
    from nosql_to_sql_migration_tool_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
        require_codec,
    )

    assert require_codec("ppm") is decode_ppm
    assert require_codec("wav") is decode_wav
