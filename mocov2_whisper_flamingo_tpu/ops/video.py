"""On-device (jit-able, batched) video preprocessing.

The fused device-side counterpart of the host ``VideoTransform``
(datamodule/transforms.py) for the production path: whole batches of decoded
frames are resized / cropped / normalized on the TPU in one program — XLA
fuses the elementwise chain into the resize gather, so frames make a single
HBM round trip before the visual frontend. Covers the north-star video
preprocessing set: ROI crop, bilinear resize, grayscale, /255 + ImageNet
normalize, temporal masking (reference semantics:
transforms.py:61-96, 27-45).

Layout: [..., T, C, H, W] float or uint8 (the dataset's torch-style layout;
the visual frontend transposes to channels-last internally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def center_crop(frames: jnp.ndarray, size: int) -> jnp.ndarray:
    """Center (mouth-ROI style) crop of [..., H, W] to [..., size, size]."""
    h, w = frames.shape[-2], frames.shape[-1]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    return frames[..., top : top + size, left : left + size]


def resize_bilinear(frames: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear resize of [..., C, H, W] to [..., C, size, size]
    (align_corners=False, torch ``interpolate`` semantics via
    jax.image.resize)."""
    out_shape = (*frames.shape[:-2], size, size)
    return jax.image.resize(frames.astype(jnp.float32), out_shape, method="bilinear")


def rgb_to_grayscale(frames: jnp.ndarray, keep_channels: bool = True) -> jnp.ndarray:
    """ITU-R 601 luma over the channel axis of [..., C, H, W]."""
    r, g, b = frames[..., 0, :, :], frames[..., 1, :, :], frames[..., 2, :, :]
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    if keep_channels:
        return jnp.repeat(gray[..., None, :, :], 3, axis=-3)
    return gray[..., None, :, :]


def normalize(frames: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """( x/255 - mean ) / std over the channel axis of [..., C, H, W]."""
    mean_a = jnp.asarray(mean, jnp.float32)[:, None, None]
    std_a = jnp.asarray(std, jnp.float32)[:, None, None]
    return (frames.astype(jnp.float32) / 255.0 - mean_a) / std_a


def eval_video_pipeline(frames: jnp.ndarray, resize: int | None = None,
                        crop: int | None = None) -> jnp.ndarray:
    """Deterministic eval path: (optional ROI crop ->) (optional resize ->)
    /255 + ImageNet normalize. Matches the reference val/test path when
    ``resize=None`` (it skips the resize, transforms.py:93-95)."""
    x = frames
    if crop:
        x = center_crop(x, crop)
    if resize:
        x = resize_bilinear(x, resize)
    return normalize(x)


def train_video_pipeline(
    frames: jnp.ndarray,
    key: jax.Array,
    resize: int = 64,
    flip_prob: float = 0.5,
    grayscale_prob: float = 0.2,
    time_mask_window: int = 10,
    time_mask_stride: int = 25,
) -> jnp.ndarray:
    """Batched stochastic train path on [B, T, C, H, W]: resize -> random
    hflip -> random grayscale -> adaptive time mask -> normalize. (Color
    jitter runs host-side — its HSV branchiness is cheap on CPU and per-clip;
    everything bandwidth-heavy runs here.)"""
    from mocov2_whisper_flamingo_tpu.ops.augment import adaptive_time_mask

    b = frames.shape[0]
    k_flip, k_gray, k_mask = jax.random.split(key, 3)
    x = resize_bilinear(frames, resize)

    do_flip = jax.random.bernoulli(k_flip, flip_prob, (b,))
    x = jnp.where(do_flip[:, None, None, None, None], x[..., ::-1], x)

    do_gray = jax.random.bernoulli(k_gray, grayscale_prob, (b,))
    x = jnp.where(do_gray[:, None, None, None, None], rgb_to_grayscale(x), x)

    x = adaptive_time_mask(x, k_mask, window=time_mask_window, stride=time_mask_stride)
    return normalize(x)
