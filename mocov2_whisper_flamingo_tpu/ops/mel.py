"""STFT -> 80-bin log-mel spectrogram, TPU-native.

Two bit-parity targets, both used by the reference:

- ``whisper_log_mel``: the Whisper feature pipeline (hann 400, hop 160,
  slaney-scale/slaney-norm mel filters, log10 with dynamic-range compression
  and (x+4)/4 scaling). Parity target: HF ``WhisperFeatureExtractor`` as used
  at reference: av_dataset.py:47-51 and the TW_tokenizer preprocessor config
  (n_fft 400, hop 160, 80 mels, 3000 frames).
- ``reference_mel``: the torchaudio ``MelSpectrogram`` the reference's actual
  training pipeline feeds to the model (HTK mel scale, no filter norm,
  power=2, no log) at reference: transforms.py:115-121.

Design notes (TPU):
- Everything is static-shape and jittable; batch via vmap or a leading axis.
- Framing uses ``conv_general_dilated_patches`` (lowered to an XLA gather the
  compiler pipelines well); the spectrum is computed either with XLA's native
  FFT or as a real-DFT matmul that runs on the MXU (``method="matmul"``),
  which wins for short n_fft because it fuses with the mel projection into
  back-to-back matmuls.
- The mel projection is a single [n_freq, n_mel] matmul — MXU work — and the
  log/scale epilogue fuses into it under XLA.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
N_FRAMES = 3000  # 30 s of audio at 16 kHz / hop 160


def hann_window(n: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Hann window. ``periodic=True`` matches torch.hann_window and numpy's
    ``np.hanning(n+1)[:-1]`` used by the Whisper feature extractor."""
    m = n if periodic else n - 1
    i = np.arange(n, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / m)
    return w.astype(dtype)


# ---------------------------------------------------------------------------
# Mel filter banks (constructed host-side with numpy; baked into the jitted
# graph as constants).
# ---------------------------------------------------------------------------


def _hz_to_mel(freq, mel_scale: str):
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)
    # slaney: linear below 1 kHz, log above
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(
        freq >= min_log_hz,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
        mels,
    )


def _mel_to_hz(mels, mel_scale: str):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@functools.lru_cache(maxsize=16)
def mel_filter_bank(
    n_freqs: int = N_FFT // 2 + 1,
    n_mels: int = N_MELS,
    sample_rate: int = SAMPLE_RATE,
    f_min: float = 0.0,
    f_max: float | None = None,
    mel_scale: str = "slaney",
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filter bank, shape [n_freqs, n_mels].

    ``mel_scale="slaney", norm="slaney"`` reproduces the Whisper filter bank;
    ``mel_scale="htk", norm=None`` reproduces torchaudio's default used at
    reference: transforms.py:115-121.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    fft_freqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_min = _hz_to_mel(f_min, mel_scale)
    mel_max = _hz_to_mel(f_max, mel_scale)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, mel_scale)

    # Triangular filters between successive center frequencies.
    fdiff = np.diff(hz_pts)  # [n_mels + 1]
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / fdiff[None, :-1]
    up = slopes[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------


def _frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Overlapping frames of a 1-D (or [B, T]) signal -> [..., n_frames, n_fft].

    Uses conv_general_dilated_patches so XLA sees one gather-style op with a
    static shape instead of a Python loop of dynamic slices.
    """
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    # Exact bit-preserving gather (a conv-patches lowering would run through
    # the MXU in compute dtype and perturb the samples).
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]).astype(np.int32)
    return jnp.take(x, jnp.asarray(idx), axis=-1)


@functools.lru_cache(maxsize=8)
def _rdft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis: cos/sin matrices [n_fft, n_fft//2+1] for matmul STFT."""
    k = np.arange(n_fft // 2 + 1)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def power_spectrogram(
    x: jnp.ndarray,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
    center: bool = True,
    method: str = "fft",
) -> jnp.ndarray:
    """|STFT|^2 of ``x`` ([T] or [B, T]) -> [..., n_frames, n_fft//2+1].

    ``center=True`` reflect-pads n_fft//2 on both sides (torch/Whisper
    convention). ``method="matmul"`` computes the spectrum as two MXU matmuls
    against the real-DFT basis — preferable on TPU for small n_fft since it
    fuses with the downstream mel projection; ``"fft"`` uses XLA's FFT.
    """
    if center:
        pad = n_fft // 2
        pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_width, mode="reflect")
    frames = _frame_signal(x, n_fft, hop)
    win = jnp.asarray(hann_window(n_fft))
    frames = frames * win
    if method == "matmul":
        # Precision.HIGHEST: parity-grade fp32 on the MXU (default TPU matmul
        # precision is bf16 inputs, which breaks mel bit-parity).
        cos_m, sin_m = _rdft_matrices(n_fft)
        re = jnp.matmul(frames, jnp.asarray(cos_m), precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        im = jnp.matmul(frames, jnp.asarray(sin_m), precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        return re * re + im * im
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    return jnp.abs(spec) ** 2


def whisper_log_mel(
    audio: jnp.ndarray,
    n_mels: int = N_MELS,
    pad_to: int | None = None,
    method: str = "matmul",
) -> jnp.ndarray:
    """Whisper log-mel features, parity with HF ``WhisperFeatureExtractor``.

    audio: [T] or [B, T] 16 kHz waveform. Returns [..., n_mels, n_frames]
    where n_frames = len(audio)//hop (the final STFT frame is dropped, as in
    Whisper). If ``pad_to`` is given, the waveform is zero-padded/truncated to
    that many samples first (Whisper uses 480000 = 30 s).
    """
    if pad_to is not None:
        t = audio.shape[-1]
        if t < pad_to:
            pad_width = [(0, 0)] * (audio.ndim - 1) + [(0, pad_to - t)]
            audio = jnp.pad(audio, pad_width)
        else:
            audio = audio[..., :pad_to]
    power = power_spectrogram(audio, method=method)[..., :-1, :]  # drop last frame
    fb = jnp.asarray(mel_filter_bank(n_mels=n_mels, mel_scale="slaney", norm="slaney"))
    mel = jnp.matmul(power, fb, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)  # [..., T, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # Dynamic-range compression: floor at (max - 8) computed over the whole
    # example (batch-wise max over time and mels), then rescale.
    reduce_axes = tuple(range(log_spec.ndim - 2, log_spec.ndim))
    peak = jnp.max(log_spec, axis=reduce_axes, keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, -1, -2)  # [..., n_mels, T]


def reference_mel(
    audio: jnp.ndarray,
    n_mels: int = N_MELS,
    method: str = "matmul",
) -> jnp.ndarray:
    """torchaudio-parity mel power spectrogram (HTK scale, no norm, no log),
    as produced by the reference train/eval audio pipeline
    (reference: transforms.py:115-121). Returns [..., n_mels, n_frames] with
    n_frames = 1 + len(audio)//hop (centered STFT, all frames kept)."""
    power = power_spectrogram(audio, method=method)
    fb = jnp.asarray(mel_filter_bank(n_mels=n_mels, mel_scale="htk", norm=None))
    mel = jnp.matmul(power, fb, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return jnp.swapaxes(mel, -1, -2)


def log_mel_spectrogram(audio: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Alias for :func:`whisper_log_mel` (the canonical Whisper feature)."""
    return whisper_log_mel(audio, **kwargs)


def pad_or_trim_mel(mel: jnp.ndarray, target_length: int = N_FRAMES) -> jnp.ndarray:
    """Pad (zeros) or trim the time axis of ``[..., n_mels, T]`` to
    ``target_length`` (reference: transforms.py:99-110)."""
    t = mel.shape[-1]
    if t < target_length:
        pad_width = [(0, 0)] * (mel.ndim - 1) + [(0, target_length - t)]
        return jnp.pad(mel, pad_width)
    return mel[..., :target_length]


def global_layer_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """LayerNorm over the *entire* tensor (no affine), matching the
    reference's final audio-pipeline step ``F.layer_norm(x, x.shape)``
    (reference: transforms.py:131,141 — quirk Q5: normalizes over the padded
    [3000, 80] mel as one population)."""
    mean = jnp.mean(x)
    var = jnp.mean(jnp.square(x - mean))
    return (x - mean) * jax.lax.rsqrt(var + eps)
