"""On-device (jit-able, batched) augmentation kernels.

The production-path counterpart of the per-sample numpy transforms in
``datamodule/transforms.py``: the same semantics expressed as pure jax ops
with explicit PRNG keys, so a whole batch is augmented on the TPU in one
fused program (mask generation is elementwise VPU work that XLA fuses into
the surrounding mel pipeline — no host roundtrip, no per-sample Python).

Semantics mirror the reference train pipeline (reference:
transforms.py:113-183): SpecAugment (2x48-bin freq masks, 2x len//8 time
masks), babble-noise SNR mixing in the mel domain (quirk Q1), global
layer-norm; plus AdaptiveTimeMask for video.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mocov2_whisper_flamingo_tpu.ops.mel import global_layer_norm

SNR_LEVELS = (-5.0, 0.0, 5.0, 10.0, 15.0, 20.0, 999999.0)


def spec_augment(
    mel_tf: jnp.ndarray,
    key: jax.Array,
    freq_mask_param: int = 48,
    n_freq_masks: int = 2,
    time_mask_ratio: int = 8,
    n_time_masks: int = 2,
) -> jnp.ndarray:
    """SpecAugment on [..., T, F] (batched over leading axes). Masks are
    built as boolean range tests against random starts — static shapes,
    fully vectorized."""
    *batch, t, f = mel_tf.shape
    time_mask_param = t // time_mask_ratio
    kf, kt = jax.random.split(key)

    def build_mask(key, length, width, n_masks, batch_shape):
        if length - width <= 0 or width <= 0:
            return jnp.ones((*batch_shape, length), bool)
        starts = jax.random.randint(
            key, (*batch_shape, n_masks), 0, length - width)  # [..., n]
        pos = jnp.arange(length)
        hit = (pos >= starts[..., None]) & (pos < (starts + width)[..., None])
        return ~jnp.any(hit, axis=-2)  # [..., length] True = keep

    keep_f = build_mask(kf, f, freq_mask_param, n_freq_masks, tuple(batch))
    keep_t = build_mask(kt, t, time_mask_param, n_time_masks, tuple(batch))
    return mel_tf * keep_t[..., :, None] * keep_f[..., None, :]


def add_noise_snr(
    signal: jnp.ndarray,
    noise: jnp.ndarray,
    snr_db: jnp.ndarray | float,
) -> jnp.ndarray:
    """torchaudio ``add_noise`` semantics over the last axis: scale noise so
    the per-row SNR equals ``snr_db``. signal [..., C, T], noise [..., T]."""
    energy_signal = jnp.sum(jnp.square(signal.astype(jnp.float32)), axis=-1)  # [..., C]
    energy_noise = jnp.maximum(
        jnp.sum(jnp.square(noise.astype(jnp.float32)), axis=-1), 1e-30)  # [...]
    original_snr_db = 10.0 * (jnp.log10(jnp.maximum(energy_signal, 1e-30))
                              - jnp.expand_dims(jnp.log10(energy_noise), -1))
    scale = jnp.power(10.0, (original_snr_db - snr_db) / 20.0)
    return (signal + scale[..., None] * noise[..., None, :]).astype(signal.dtype)


def add_babble_noise(
    mel_tf: jnp.ndarray,
    noise_bed: jnp.ndarray,
    key: jax.Array,
    snr_levels=SNR_LEVELS,
) -> jnp.ndarray:
    """Mel-domain babble mixing (quirk Q1): slice a random segment of the
    noise bed, pick a random SNR level, mix per mel-bin row
    (reference: transforms.py:47-59,130)."""
    *batch, t, f = mel_tf.shape
    k_start, k_snr = jax.random.split(key)
    start = jax.random.randint(k_start, tuple(batch), 0,
                               jnp.maximum(noise_bed.shape[-1] - t, 1))
    level_idx = jax.random.randint(k_snr, tuple(batch), 0, len(snr_levels))
    snr = jnp.asarray(snr_levels)[level_idx]

    def mix_one(mel, s, snr_one):
        seg = jax.lax.dynamic_slice(noise_bed, (s,), (t,))
        return add_noise_snr(mel.T, seg, snr_one).T  # rows = mel bins

    if batch:
        return jax.vmap(mix_one)(mel_tf, start, snr)
    return mix_one(mel_tf, start, snr)


def adaptive_time_mask(
    frames: jnp.ndarray,
    key: jax.Array,
    window: int = 10,
    stride: int = 25,
) -> jnp.ndarray:
    """Zero random temporal spans of [..., T, ...video dims] (reference:
    transforms.py:27-45): ~T/stride masks, each a random width in
    [0, window)."""
    t = frames.shape[-4] if frames.ndim >= 4 else frames.shape[0]
    n_mask = int((t + stride - 0.1) // stride)
    if n_mask == 0 or t <= 1:
        return frames
    kw, ks = jax.random.split(key)
    widths = jax.random.randint(kw, (n_mask,), 0, window)
    starts = jax.random.randint(ks, (n_mask,), 0, jnp.maximum(t - widths, 1))
    pos = jnp.arange(t)
    hit = (pos[None, :] >= starts[:, None]) & (pos[None, :] < (starts + widths)[:, None])
    keep = ~jnp.any(hit, axis=0)  # [T]
    shape = [1] * frames.ndim
    axis = frames.ndim - 4 if frames.ndim >= 4 else 0
    shape[axis] = t
    return frames * keep.reshape(shape)


def train_audio_pipeline(
    mel: jnp.ndarray,
    key: jax.Array,
    noise_bed: jnp.ndarray | None = None,
    target_length: int = 3000,
) -> jnp.ndarray:
    """Fused on-device train pipeline on a batched mel [..., F, T]:
    SpecAugment -> pad/trim -> (optional) babble mix -> global layer-norm —
    the jit-able equivalent of the reference's per-sample torch pipeline
    (reference: transforms.py:122-132)."""
    x = jnp.swapaxes(mel, -1, -2)  # [..., T, F]
    k1, k2 = jax.random.split(key)
    x = spec_augment(x, k1)
    t = x.shape[-2]
    if t < target_length:
        pads = [(0, 0)] * (x.ndim - 2) + [(0, target_length - t), (0, 0)]
        x = jnp.pad(x, pads)
    else:
        x = x[..., :target_length, :]
    if noise_bed is not None:
        x = add_babble_noise(x, noise_bed, k2)
    if x.ndim == 2:
        return global_layer_norm(x)
    return jax.vmap(global_layer_norm)(x.reshape(-1, *x.shape[-2:])).reshape(x.shape)
