"""Native IO library tests: wav round-trip, resampler quality, batch packer
vs the greedy reference semantics."""

import math
import os
import wave

import numpy as np
import pytest

from mocov2_whisper_flamingo_tpu.datamodule import native


def _write_wav(path, data, sr=16000, channels=1, width=2):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        if width == 2:
            pcm = np.clip(data * 32767, -32768, 32767).astype("<i2")
        else:
            raise ValueError(width)
        w.writeframes(pcm.tobytes())


def test_native_library_builds():
    lib = native.load_library()
    assert lib is not None, "g++ build of native/avsr_io.cpp failed"


def test_wav_roundtrip(tmp_path, rng):
    sr = 16000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    path = tmp_path / "test.wav"
    _write_wav(path, x, sr=sr)

    info = native.wav_info(str(path))
    assert info == (sr, 1, sr)
    data, got_sr = native.read_wav_mono(str(path))
    assert got_sr == sr and len(data) == sr
    np.testing.assert_allclose(data, x, atol=1e-4)


def test_wav_stereo_downmix(tmp_path, rng):
    sr = 8000
    left = rng.uniform(-0.8, 0.8, 1000).astype(np.float32)
    right = rng.uniform(-0.8, 0.8, 1000).astype(np.float32)
    inter = np.stack([left, right], axis=1).reshape(-1)
    path = tmp_path / "stereo.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.clip(inter * 32767, -32768, 32767).astype("<i2").tobytes())

    data, got_sr = native.read_wav_mono(str(path))
    np.testing.assert_allclose(data, (left + right) / 2, atol=1e-3)


def test_resample_preserves_tone():
    """A 440 Hz tone resampled 44.1k -> 16k must stay a 440 Hz tone."""
    sr_in, sr_out = 44100, 16000
    t_in = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t_in).astype(np.float32)
    y = native.resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 2
    # dominant FFT bin must be 440 Hz
    spec = np.abs(np.fft.rfft(y[: sr_out]))
    peak_hz = np.argmax(spec) * sr_out / len(y[:sr_out]) / 1.0
    assert abs(peak_hz - 440) < 2, peak_hz
    # amplitude preserved within a few percent (interior, away from edges)
    assert abs(np.max(np.abs(y[100:-100])) - 1.0) < 0.05


def test_resample_identity():
    x = np.random.default_rng(0).standard_normal(1234).astype(np.float32)
    y = native.resample(x, 16000, 16000)
    np.testing.assert_array_equal(x, y)


def _reference_batch_by_size(indices, sizes, max_tokens):
    batches, cur, cur_max = [], [], 0
    for idx in indices:
        sz = sizes[idx]
        new_max = max(cur_max, sz)
        if cur and (len(cur) + 1) * new_max > max_tokens:
            batches.append(cur)
            cur, cur_max = [idx], sz
        else:
            cur.append(idx)
            cur_max = new_max
    if cur:
        batches.append(cur)
    return batches


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_by_size_matches_reference_semantics(seed):
    rng = np.random.default_rng(seed)
    n = 200
    sizes = rng.integers(1, 400, size=n)
    indices = np.argsort(-sizes, kind="stable")  # descending, like the sampler
    max_tokens = 1600

    ours = native.batch_by_size(indices, sizes, max_tokens)
    ref = _reference_batch_by_size(list(indices), sizes, max_tokens)
    assert [list(b) for b in ours] == [list(b) for b in ref]
    # every sample appears exactly once
    flat = np.concatenate(ours)
    assert sorted(flat) == list(range(n))
    # token budget respected (singleton batches may exceed)
    for b in ours:
        if len(b) > 1:
            assert len(b) * max(sizes[i] for i in b) <= max_tokens


def test_batch_by_size_empty_and_singleton():
    assert native.batch_by_size(np.array([], dtype=np.int64), np.array([5]), 10) == []
    out = native.batch_by_size(np.array([0]), np.array([10_000]), 10)
    assert [list(b) for b in out] == [[0]]
