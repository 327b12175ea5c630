"""Golden parity tests for the audio DSP kernels.

Oracles (all offline-capable):
- HF ``WhisperFeatureExtractor`` (pure numpy) for the Whisper log-mel path.
- torch STFT/mel (CPU) reimplemented checks for the reference_mel path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.ops import mel as mel_ops


def _make_audio(rng, seconds=2.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.shape)
    return x.astype(np.float32)


def test_hann_window_matches_torch(rng):
    torch = pytest.importorskip("torch")
    ours = mel_ops.hann_window(400)
    theirs = torch.hann_window(400, periodic=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mel_filter_bank_matches_hf_slaney():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ours = mel_ops.mel_filter_bank(201, 80, 16000, mel_scale="slaney", norm="slaney")
    theirs = hf_fb(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-6)


def test_mel_filter_bank_matches_hf_htk():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ours = mel_ops.mel_filter_bank(201, 80, 16000, mel_scale="htk", norm=None)
    theirs = hf_fb(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm=None,
        mel_scale="htk",
    )
    np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-5)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_whisper_log_mel_parity(rng, method):
    """Bit-parity (to fp32 tolerance) with WhisperFeatureExtractor on a 30 s
    padded clip — BASELINE config 1's mel-parity requirement."""
    from transformers import WhisperFeatureExtractor

    audio = _make_audio(rng, seconds=3.0)
    fe = WhisperFeatureExtractor(feature_size=80, sampling_rate=16000)
    ref = fe(audio, sampling_rate=16000, return_tensors="np", padding="max_length")
    ref_mel = ref.input_features[0]  # [80, 3000]

    ours = np.asarray(mel_ops.whisper_log_mel(jnp.asarray(audio), pad_to=480000, method=method))
    assert ours.shape == ref_mel.shape == (80, 3000)
    np.testing.assert_allclose(ours, ref_mel, atol=2e-4, rtol=1e-4)


def test_whisper_log_mel_batched(rng):
    audio = np.stack([_make_audio(rng), _make_audio(rng)])
    out = mel_ops.whisper_log_mel(jnp.asarray(audio), pad_to=480000)
    single = mel_ops.whisper_log_mel(jnp.asarray(audio[0]), pad_to=480000)
    assert out.shape == (2, 80, 3000)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), atol=1e-5)


def test_reference_mel_matches_torch_stft(rng):
    """reference_mel must match torchaudio's MelSpectrogram. torchaudio is not
    installed, so rebuild its exact computation from torch.stft + the HTK
    filter bank (validated against HF above)."""
    torch = pytest.importorskip("torch")
    audio = _make_audio(rng, seconds=1.0)

    at = torch.from_numpy(audio)
    spec = torch.stft(
        at, n_fft=400, hop_length=160, win_length=400,
        window=torch.hann_window(400), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    power = spec.abs() ** 2  # [201, T]
    fb = torch.from_numpy(mel_ops.mel_filter_bank(201, 80, 16000, mel_scale="htk", norm=None))
    ref = (fb.T @ power).numpy()  # [80, T]

    ours = np.asarray(mel_ops.reference_mel(jnp.asarray(audio)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)


def test_pad_or_trim_and_global_layer_norm(rng):
    x = jnp.asarray(rng.standard_normal((80, 120)).astype(np.float32))
    padded = mel_ops.pad_or_trim_mel(x, 3000)
    assert padded.shape == (80, 3000)
    trimmed = mel_ops.pad_or_trim_mel(padded, 100)
    assert trimmed.shape == (80, 100)

    normed = mel_ops.global_layer_norm(padded)
    assert abs(float(jnp.mean(normed))) < 1e-5
    assert abs(float(jnp.std(normed)) - 1.0) < 1e-3
