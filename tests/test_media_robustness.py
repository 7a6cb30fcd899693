"""Adversarial robustness of every media decoder: random mutations and
truncations of valid streams must either decode to an array/frames or
raise ValueError — NEVER any other exception type.  This is the
contract the multimodal per-row ok/err design depends on: at 100 TB,
bit-rot and truncated uploads are ordinary data, and an escaped
struct.error/zlib.error/IndexError would fail whole Spark tasks."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from whoosh_reloaded_spark.audio import wav_decode, wav_encode
from whoosh_reloaded_spark.imaging import png_decode, png_encode
from whoosh_reloaded_spark.jpeg import (
    jpeg_dc_preview,
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
)
from whoosh_reloaded_spark.video import (
    avi_encode_mjpeg,
    avi_frames,
    avi_info,
    avi_sample_frames,
)


def _img(seed, h=24, w=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _mutate(data: bytes, rng) -> bytes:
    data = bytearray(data)
    mode = rng.integers(0, 4)
    if mode == 0:  # flip random bytes
        for _ in range(int(rng.integers(1, 8))):
            data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
    elif mode == 1:  # truncate
        data = data[: int(rng.integers(1, len(data)))]
    elif mode == 2:  # delete a slice
        a = int(rng.integers(0, len(data) - 1))
        b = int(rng.integers(a + 1, min(len(data), a + 64) + 1))
        del data[a:b]
    else:  # insert garbage
        at = int(rng.integers(0, len(data)))
        data[at:at] = bytes(rng.integers(0, 256, size=int(rng.integers(1, 32)), dtype=np.uint8))
    return bytes(data)


def _only_valueerror(fn, payload):
    try:
        fn(payload)
    except ValueError:
        pass  # the documented failure mode
    # any other exception type propagates and fails the test


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 2**31), q=st.integers(50, 100),
       prog=st.booleans())
def test_jpeg_mutation_fuzz(seed, q, prog):
    rng = np.random.default_rng(seed)
    enc = jpeg_encode_progressive if prog else jpeg_encode
    data = enc(_img(seed), quality=q)
    for _ in range(3):
        mutated = _mutate(data, rng)
        _only_valueerror(jpeg_decode, mutated)
        _only_valueerror(jpeg_dc_preview, mutated)


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(0, 2**31),
       ft=st.sampled_from([0, 1, 2, 3, 4, "auto"]))
def test_png_mutation_fuzz(seed, ft):
    rng = np.random.default_rng(seed)
    data = png_encode(_img(seed), filter_type=ft)
    for _ in range(3):
        _only_valueerror(png_decode, _mutate(data, rng))


@settings(max_examples=80, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_avi_mutation_fuzz(seed):
    rng = np.random.default_rng(seed)
    frames = [jpeg_encode(_img(seed + i, 16, 16), quality=90)
              for i in range(3)]
    data = avi_encode_mjpeg(frames, 16, 16, fps=10)

    def full_walk(payload):
        avi_info(payload)
        for _, f in avi_sample_frames(payload, every_nth=2):
            jpeg_decode(f)

    for _ in range(3):
        mutated = _mutate(data, rng)
        _only_valueerror(full_walk, mutated)
        _only_valueerror(lambda p: list(avi_frames(p)), mutated)


@settings(max_examples=80, deadline=None)
@given(seed=st.integers(0, 2**31),
       width=st.sampled_from([8, 16, 32]))
def test_wav_mutation_fuzz(seed, width):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-100, 100, size=500).astype(np.int64)
    data = wav_encode(samples, sample_rate=8000, bits=width)
    for _ in range(3):
        _only_valueerror(wav_decode, _mutate(data, rng))
