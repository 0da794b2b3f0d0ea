"""Pure-numpy media codecs (multimodal/codecs.py) + end-to-end actor
stages on REAL payloads."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from mismo_ray.multimodal.codecs import (
    CodecError,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    wav_sample_rate,
)


def test_ppm_round_trip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_pgm_round_trip_replicates_gray():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_ppm(encode_ppm(gray))
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_ppm_header_comments_and_errors():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    raw = encode_ppm(img)
    with_comment = raw.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert decode_ppm(with_comment).shape == (2, 2, 3)
    with pytest.raises(CodecError):
        decode_ppm(b"JFIF....")
    with pytest.raises(CodecError):
        decode_ppm(raw[:-3])  # truncated raster


def test_wav_round_trip_and_features():
    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_wav(sine, sample_rate=sr)
    wave = decode_wav(payload)
    assert wav_sample_rate(payload) == sr
    assert wave.dtype == np.float32 and len(wave) == sr
    # 16-bit quantization error is < 1e-4 rms
    assert np.abs(wave - sine).max() < 1e-3
    # sine RMS = amplitude / sqrt(2)
    assert abs(float(np.sqrt((wave**2).mean())) - 0.5 / np.sqrt(2)) < 1e-3


def test_wav_stereo_averages_and_bit_depths():
    import struct

    stereo = np.array([0.5, -0.5, 0.25, 0.25], dtype=np.float64)
    pcm = np.round(stereo * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    wave = decode_wav(payload)
    assert np.allclose(wave, [0.0, 0.25], atol=1e-3)
    with pytest.raises(CodecError):
        decode_wav(b"RIFFxxxxWAVX")


def test_image_stage_end_to_end_real_ppm(ray_session):
    from mismo_ray.multimodal import ImageResizer, featurize_images
    from mismo_ray.multimodal.codecs import decode_ppm as dec

    rng = np.random.default_rng(3)
    payloads = [
        encode_ppm(rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    t = pa.table(
        {
            "record_id": pa.array(range(4), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
    ds = ray.data.from_arrow(t).materialize()
    feats = featurize_images(ds, decoder=dec, concurrency=1).to_pandas()
    assert feats["image_features"].map(len).eq(7).all()
    # resize to 3x3, re-encode as PPM, decode back
    resized = ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={
            "height": 3,
            "width": 3,
            "decoder": dec,
            "encoder": encode_ppm,
        },
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    for p in resized["resized_payload"]:
        assert decode_ppm(p).shape == (3, 3, 3)


def test_audio_stage_end_to_end_real_wav(ray_session):
    from mismo_ray.multimodal import AudioFeaturizer

    sr = 4000
    tt = np.arange(sr, dtype=np.float64) / sr
    payloads = [
        encode_wav(0.3 * np.sin(2 * np.pi * f * tt), sample_rate=sr)
        for f in (100, 200)
    ]
    t = pa.table(
        {
            "record_id": pa.array(range(2), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            AudioFeaturizer,
            fn_constructor_kwargs={"decoder": decode_wav},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("record_id")
    )
    rms = [f[0] for f in out["audio_features"]]
    assert all(abs(r - 0.3 / np.sqrt(2)) < 1e-2 for r in rms)
    # zero-crossing rate scales with frequency (2f crossings/sec)
    zcr = [f[1] for f in out["audio_features"]]
    assert abs(zcr[0] - 200 / sr) < 0.01 and abs(zcr[1] - 400 / sr) < 0.01
