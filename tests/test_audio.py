"""WAV/PCM audio codec: cross-validation against the independent stdlib
`wave` encoder, roundtrip exactness, closed-form feature checks, and
the Spark decode_audio / synthetic_audio pipeline."""

import io
import struct
import wave

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from whoosh_reloaded_spark.audio import (
    audio_features,
    energy_hash,
    wav_decode,
    wav_encode,
)

RNG = np.random.default_rng(0xA0D10)


def _stdlib_wav(samples: np.ndarray, rate: int, n_ch: int) -> bytes:
    """Encode via the stdlib wave module — an implementation independent
    of ours, so decode correctness isn't a shared-bug roundtrip."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


@pytest.mark.parametrize("n_ch", [1, 2])
def test_decode_stdlib_encoded(n_ch):
    samples = RNG.integers(-30000, 30000, size=(500, n_ch), dtype=np.int64)
    data = _stdlib_wav(samples, 22050, n_ch)
    rate, out = wav_decode(data)
    assert rate == 22050
    np.testing.assert_array_equal(out, samples)


@pytest.mark.parametrize("bits", [8, 16, 32])
def test_roundtrip_bit_depths(bits):
    lim = 120 if bits == 8 else 30000
    samples = RNG.integers(-lim, lim, size=(300, 2), dtype=np.int64)
    rate, out = wav_decode(wav_encode(samples, 8000, bits=bits))
    assert rate == 8000
    np.testing.assert_array_equal(out, samples)


def test_our_encoder_readable_by_stdlib():
    samples = RNG.integers(-30000, 30000, size=(400, 1), dtype=np.int64)
    data = wav_encode(samples, 16000, bits=16)
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        got = np.frombuffer(w.readframes(400), dtype="<i2")
    np.testing.assert_array_equal(got, samples[:, 0])


def test_corruption_and_unsupported():
    samples = RNG.integers(-100, 100, size=(64, 1), dtype=np.int64)
    data = bytearray(wav_encode(samples, 8000))
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"nope" + bytes(data))
    with pytest.raises(ValueError):
        wav_decode(bytes(data[:20]))
    # non-PCM format code
    bad = bytearray(data)
    fmt_at = bytes(bad).find(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_at, 3)  # IEEE float
    with pytest.raises(ValueError, match="format"):
        wav_decode(bytes(bad))


def test_features_closed_form():
    """Features on a closed-form signal: sum_sq/rms/peak/duration match
    direct computation (the SQL-oracle-style invariant)."""
    d = 5
    n = 800 + (d % 5) * 200
    i = np.arange(n, dtype=np.int64)
    samples = ((d * 13 + i * 7) % 201) - 100
    f = audio_features(wav_encode(samples, 16000))
    assert f["sample_rate"] == 16000
    assert f["channels"] == 1
    assert f["n_frames"] == n
    assert f["duration_ms"] == n * 1000 // 16000
    expect_sumsq = int((samples.astype(np.int64) ** 2).sum())
    assert f["sum_sq"] == expect_sumsq
    assert f["rms"] == pytest.approx(float(np.sqrt(expect_sumsq / n)))
    assert f["peak"] == int(np.abs(samples).max())
    assert len(f["energy_hash"]) == 4


def test_energy_hash_pattern():
    """Quiet first half / loud second half -> bits 0x00ff; near-dup
    property mirrors the image aHash."""
    mono = np.concatenate(
        [np.zeros(800, np.int64), np.full(800, 1000, np.int64)]
    )
    assert energy_hash(mono, 16) == "00ff"
    tweaked = mono.copy()
    tweaked[:10] += 3
    other = RNG.integers(-1000, 1000, size=1600).astype(np.int64)

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    assert ham(energy_hash(mono), energy_hash(tweaked)) <= 1
    assert ham(energy_hash(mono), energy_hash(other)) >= 4


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 400),
    n_ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_fuzz(n, n_ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32000, 32000, size=(n, n_ch), dtype=np.int64)
    r, out = wav_decode(wav_encode(samples, rate))
    assert r == rate
    np.testing.assert_array_equal(out, samples)


def test_decode_audio_pipeline(spark):
    """End-to-end Spark: synthetic WAVs -> decode_audio; rates/frames/
    sum_sq match the closed-form formula; corrupt payload -> ok=false."""
    from whoosh_reloaded_spark.multimodal import decode_audio, synthetic_audio

    ids = spark.range(0, 15).withColumnRenamed("id", "doc_id")
    rows = {r["media_id"]: r for r in decode_audio(synthetic_audio(ids)).collect()}
    assert len(rows) == 15
    for d, r in rows.items():
        n = 800 + (d % 5) * 200
        i = np.arange(n, dtype=np.int64)
        samples = ((d * 13 + i * 7) % 201) - 100
        assert r["ok"], r["err"]
        assert r["sample_rate"] == 8000 * (1 + d % 3)
        assert r["n_frames"] == n
        assert r["sum_sq"] == int((samples**2).sum())
        assert r["duration_ms"] == n * 1000 // (8000 * (1 + d % 3))

    bad = spark.createDataFrame(
        [(99, b"RIFFxxxxWAVEgarbage")], "media_id long, payload binary"
    )
    br = decode_audio(bad).collect()[0]
    assert br["ok"] is False and br["err"] is not None
