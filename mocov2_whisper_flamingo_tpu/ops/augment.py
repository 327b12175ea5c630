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
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SpecAugment on [..., T, F] (batched over leading axes). Masks are
    built as boolean range tests against random starts — static shapes,
    fully vectorized.

    ``lengths`` (shape = batch dims): per-sample REAL frame counts for mel
    that was padded before augmentation. Time masks then use the host/
    reference semantics on the real region (width = length // ratio, start
    in [0, length - width)), so padding never absorbs a mask
    (reference: transforms.py:163-179 masks pre-pad)."""
    *batch, t, f = mel_tf.shape
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
    if lengths is None:
        keep_t = build_mask(kt, t, t // time_mask_ratio, n_time_masks,
                            tuple(batch))
    else:
        lengths = jnp.asarray(lengths).reshape(*batch)  # [...]
        width = (lengths // time_mask_ratio)[..., None]  # [..., 1]
        u = jax.random.uniform(kt, (*batch, n_time_masks))
        span = jnp.maximum(lengths[..., None] - width, 0)
        starts = jnp.floor(u * span).astype(jnp.int32)  # [..., n]
        pos = jnp.arange(t)
        hit = ((pos >= starts[..., None]) & (pos < (starts + width)[..., None])
               & (width[..., None] > 0))
        keep_t = ~jnp.any(hit, axis=-2)
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
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Zero random temporal spans of [..., T, ...video dims] (reference:
    transforms.py:27-45): ~T/stride masks, each a random width in
    [0, window).

    ``lengths`` [B] (requires frames [B, T, C, H, W]): per-sample REAL
    frame counts for clips padded before augmentation — per-sample masks,
    count scaled to the real length (host semantics: ~len/stride masks
    within [0, len)), so padding neither absorbs masks nor inflates their
    number."""
    t = frames.shape[-4] if frames.ndim >= 4 else frames.shape[0]
    n_mask = int((t + stride - 0.1) // stride)
    if n_mask == 0 or t <= 1:
        return frames
    kw, ks = jax.random.split(key)
    if lengths is None:
        widths = jax.random.randint(kw, (n_mask,), 0, window)
        starts = jax.random.randint(ks, (n_mask,), 0, jnp.maximum(t - widths, 1))
        pos = jnp.arange(t)
        hit = ((pos[None, :] >= starts[:, None])
               & (pos[None, :] < (starts + widths)[:, None]))
        keep = ~jnp.any(hit, axis=0)  # [T]
        shape = [1] * frames.ndim
        axis = frames.ndim - 4 if frames.ndim >= 4 else 0
        shape[axis] = t
        return frames * keep.reshape(shape)
    if frames.ndim != 5:
        raise ValueError("lengths requires batched [B, T, C, H, W] frames")
    b = frames.shape[0]
    lengths = jnp.asarray(lengths).reshape(b)
    widths = jax.random.randint(kw, (b, n_mask), 0, window)
    # host draws floor((len + stride - 0.1)/stride) masks; extras vanish
    allowed = (jnp.arange(n_mask)[None, :]
               < jnp.ceil((lengths[:, None] - 0.1) / stride).astype(jnp.int32))
    widths = jnp.where(allowed & (widths < lengths[:, None]), widths, 0)
    u = jax.random.uniform(ks, (b, n_mask))
    starts = jnp.floor(u * jnp.maximum(lengths[:, None] - widths, 1)
                       ).astype(jnp.int32)
    pos = jnp.arange(t)
    hit = ((pos[None, None, :] >= starts[..., None])
           & (pos[None, None, :] < (starts + widths)[..., None]))
    keep = ~jnp.any(hit, axis=1)  # [B, T]
    return frames * keep[:, :, None, None, None]


def train_audio_pipeline(
    mel: jnp.ndarray,
    key: jax.Array,
    noise_bed: jnp.ndarray | None = None,
    target_length: int = 3000,
    lengths: jnp.ndarray | None = None,
    spec_augment_kwargs: dict | None = None,
    snr_levels=SNR_LEVELS,
) -> jnp.ndarray:
    """Fused on-device train pipeline on a batched mel [..., F, T]:
    SpecAugment -> pad/trim -> (optional) babble mix -> global layer-norm —
    the jit-able equivalent of the reference's per-sample torch pipeline
    (reference: transforms.py:122-132).

    ``lengths``: per-sample real frame counts when ``mel`` arrives
    pre-padded (the on-device augmentation mode) — time masks stay inside
    the real region, matching the host's augment-before-pad order."""
    x = jnp.swapaxes(mel, -1, -2)  # [..., T, F]
    k1, k2 = jax.random.split(key)
    x = spec_augment(x, k1, lengths=lengths, **(spec_augment_kwargs or {}))
    t = x.shape[-2]
    if t < target_length:
        pads = [(0, 0)] * (x.ndim - 2) + [(0, target_length - t), (0, 0)]
        x = jnp.pad(x, pads)
    else:
        x = x[..., :target_length, :]
    if noise_bed is not None:
        x = add_babble_noise(x, noise_bed, k2, snr_levels=snr_levels)
    if x.ndim == 2:
        return global_layer_norm(x)
    return jax.vmap(global_layer_norm)(x.reshape(-1, *x.shape[-2:])).reshape(x.shape)


def make_batch_augment(config, np_module=None):
    """Build the jit-able on-device train augmentation
    ``augment(batch, key) -> batch`` from the config's augmentation section
    (``augmentation.on_device: true`` mode).

    The host loader then only decodes + computes the raw mel + resizes
    video (cheap, GIL-free work); all stochastic augmentation —
    SpecAugment, babble SNR mixing, global layer-norm, flip/ColorJitter/
    grayscale/time-mask/ImageNet-normalize — runs inside the jitted train
    step on the TPU. This is the fix for single-core hosts where the
    per-sample numpy pipeline (~1.1 s/batch measured) can never feed an
    88 ms device step (BASELINE.md sustained-training entry).

    Expected batch layout (from ``AVDataset`` in on-device mode):
    ``audio`` [B, 3000, 80] RAW mel (no augment/LN) — or, with
    ``augmentation.on_device_mel``, [B, 480200] packed raw waveform
    (``av_dataset.pack_waveform``; the mel itself then runs as matmul-DFT
    on the MXU, removing the host STFT entirely) — ``audio_mask``
    [B, 3000] True=valid, ``video`` [B, T, C, H, W] uint8 RAW 0-255
    (resized only), ``video_lengths`` [B].

    Documented distribution deviations vs the host path (both harmless to
    the objective): ColorJitter applies ops in a fixed order (host samples
    a permutation per clip), and video pad frames are re-zeroed after
    normalization (host pads after normalize; the visual frontend
    zero-fills past ``video_lengths`` either way).
    """
    from mocov2_whisper_flamingo_tpu.ops.video import train_video_pipeline

    a_cfg = config["augmentation"]["audio"]["train"]
    v_cfg = config["augmentation"]["video"]["train"]
    spec_kwargs = dict(
        freq_mask_param=a_cfg.get("freq_mask_param", 48),
        n_freq_masks=a_cfg.get("n_freq_masks", 2),
        time_mask_ratio=a_cfg.get("time_mask_ratio", 8),
        n_time_masks=a_cfg.get("n_time_masks", 2),
    )
    snr_levels = tuple(a_cfg.get("snr_levels", SNR_LEVELS))
    noise_bed = None
    noise_file = a_cfg.get("noise_file")
    if noise_file:
        try:
            from mocov2_whisper_flamingo_tpu.datamodule.native import read_wav_mono

            bed, sr = read_wav_mono(noise_file)
            assert sr == 16_000, f"noise wav must be 16 kHz, got {sr}"
            noise_bed = jnp.asarray(bed)
        except FileNotFoundError:
            pass  # same no-op-with-warning semantics as the host AddNoise
    jitter_cfg = v_cfg.get("color_jitter") or {}
    jitter = (jitter_cfg.get("brightness", 0.4), jitter_cfg.get("contrast", 0.4),
              jitter_cfg.get("saturation", 0.4), jitter_cfg.get("hue", 0.1))

    def augment(batch: dict, key: jax.Array) -> dict:
        ka, kv = jax.random.split(key)
        out = dict(batch)
        if batch.get("audio") is not None:
            audio = batch["audio"]
            lengths = None
            if batch.get("audio_mask") is not None:
                lengths = jnp.sum(batch["audio_mask"].astype(jnp.int32), axis=-1)
            if audio.ndim == 2:
                # on_device_mel mode: [B, S] packed raw waveform
                # (av_dataset.pack_waveform) — mel on the MXU. The reflect
                # tail in the padding makes real frames bit-match the host
                # STFT; frames past the real count are computed from the
                # tail/zeros and masked out here.
                from mocov2_whisper_flamingo_tpu.ops.mel import N_FRAMES, reference_mel

                t_len = (batch["audio_mask"].shape[-1]
                         if batch.get("audio_mask") is not None else N_FRAMES)
                mel_ft = reference_mel(audio)[..., :t_len]  # [B, F, T]
                if lengths is not None:
                    valid = jnp.arange(t_len)[None, :] < lengths[:, None]
                    mel_ft = mel_ft * valid[:, None, :]
            else:
                mel_ft = jnp.swapaxes(audio, -1, -2)  # [B, T, F] -> [B, F, T]
                t_len = audio.shape[-2]
            out["audio"] = train_audio_pipeline(
                mel_ft, ka, noise_bed=noise_bed,
                target_length=t_len, lengths=lengths,
                spec_augment_kwargs=spec_kwargs, snr_levels=snr_levels)
        if batch.get("video") is not None:
            x = train_video_pipeline(
                batch["video"], kv, resize=None,
                flip_prob=v_cfg.get("random_flip_prob", 0.5),
                jitter=jitter,
                grayscale_prob=v_cfg.get("grayscale_prob", 0.2),
                time_mask_window=v_cfg.get("time_mask_window", 10),
                time_mask_stride=v_cfg.get("time_mask_stride", 25),
                lengths=batch.get("video_lengths"))
            out["video"] = x
        return out

    return augment
