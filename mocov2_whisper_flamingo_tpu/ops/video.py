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


def _rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, H, W] in [0,1] -> HSV (same algorithm as the host transform,
    datamodule/transforms.py:206-220, itself torch-parity-tested)."""
    r, g, b = img[..., 0, :, :], img[..., 1, :, :], img[..., 2, :, :]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-12), 0.0)
    dc = jnp.where(deltac == 0, 1.0, deltac)
    rc, gc, bc = (maxc - r) / dc, (maxc - g) / dc, (maxc - b) / dc
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(deltac == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, maxc], axis=-3)


def _hsv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    h, s, v = img[..., 0, :, :], img[..., 1, :, :], img[..., 2, :, :]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    def pick(choices):
        # elementwise select chain, NOT a stacked take_along_axis: general
        # gathers over [6, B, T, H, W] operands lower to scatter/gather
        # loops on TPU (~100x slow, CLAUDE.md); six fused selects are pure
        # VPU work.
        out = choices[0]
        for k in range(1, 6):
            out = jnp.where(i == k, choices[k], out)
        return out

    return jnp.stack([
        pick([v, q, p, p, t, v]),
        pick([t, v, v, q, p, p]),
        pick([p, p, t, v, v, q]),
    ], axis=-3)


def color_jitter_with_factors(x: jnp.ndarray, f_brightness: jnp.ndarray,
                              f_contrast: jnp.ndarray, f_saturation: jnp.ndarray,
                              hue_shift: jnp.ndarray) -> jnp.ndarray:
    """ColorJitter on [B, T, C, H, W] in [0,1] with per-sample factors [B],
    applied brightness -> contrast -> saturation -> hue (each clamped).

    The per-op math is exact torchvision (same as the host transform,
    transforms.py:241-267); the op ORDER is fixed on-device, where the host/
    reference samples a random permutation per clip — a documented
    augmentation-distribution deviation (lax.switch over 24 orders would
    multiply compile time for no modeling benefit)."""
    bvec = lambda f: f[:, None, None, None, None]
    x = jnp.clip(x * bvec(f_brightness), 0.0, 1.0)

    gray = (0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2])
    mean = gray.mean(axis=(-2, -1), keepdims=True)[:, :, None]
    x = jnp.clip(bvec(f_contrast) * x + (1.0 - bvec(f_contrast)) * mean, 0.0, 1.0)

    gray = (0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2])[:, :, None]
    x = jnp.clip(bvec(f_saturation) * x + (1.0 - bvec(f_saturation)) * gray, 0.0, 1.0)

    hsv = _rgb_to_hsv(x)
    h = (hsv[..., 0, :, :] + hue_shift[:, None, None, None]) % 1.0
    hsv = jnp.concatenate([h[..., None, :, :], hsv[..., 1:, :, :]], axis=-3)
    return jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)


def color_jitter(x: jnp.ndarray, key: jax.Array, brightness: float = 0.4,
                 contrast: float = 0.4, saturation: float = 0.4,
                 hue: float = 0.1) -> jnp.ndarray:
    """Random per-sample ColorJitter on [B, T, C, H, W] in [0,1]
    (reference: transforms.py:70 ColorJitter(0.4, 0.4, 0.4, 0.1))."""
    b = x.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    u = lambda k, lo, hi: jax.random.uniform(k, (b,), minval=lo, maxval=hi)
    return color_jitter_with_factors(
        x,
        u(kb, max(0.0, 1 - brightness), 1 + brightness),
        u(kc, max(0.0, 1 - contrast), 1 + contrast),
        u(ks, max(0.0, 1 - saturation), 1 + saturation),
        u(kh, -hue, hue),
    )


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
    resize: int | None = 64,
    crop: int | None = None,
    flip_prob: float = 0.5,
    jitter: tuple = (0.4, 0.4, 0.4, 0.1),
    grayscale_prob: float = 0.2,
    time_mask_window: int = 10,
    time_mask_stride: int = 25,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched stochastic train path on [B, T, C, H, W] raw (0-255) frames —
    the fused device twin of the host ``VideoTransform`` train path, in the
    reference op order (reference: transforms.py:66-74): (ROI crop ->)
    resize -> /255 -> random hflip -> ColorJitter -> random grayscale ->
    adaptive time mask -> ImageNet normalize, all in one jit so frames make
    a single HBM round trip before the visual frontend.

    ``resize=None`` skips the resize (frames already at target size, e.g.
    resized by the host loader in on-device-augmentation mode).
    ``lengths`` [B]: per-sample real frame counts for pre-padded clips —
    time masks stay within the real region and pad frames are re-zeroed
    after normalization (the host path pads AFTER normalize, so its pad
    rows are exact zeros; the frontend zero-fills features past the length
    either way)."""
    from mocov2_whisper_flamingo_tpu.ops.augment import adaptive_time_mask

    b = frames.shape[0]
    k_flip, k_jit, k_gray, k_mask = jax.random.split(key, 4)
    x = frames
    if crop:
        x = center_crop(x, crop)
    if resize is not None and (x.shape[-2] != resize or x.shape[-1] != resize):
        x = resize_bilinear(x, resize)
    x = x.astype(jnp.float32) / 255.0

    do_flip = jax.random.bernoulli(k_flip, flip_prob, (b,))
    x = jnp.where(do_flip[:, None, None, None, None], x[..., ::-1], x)

    if jitter is not None:
        x = color_jitter(x, k_jit, *jitter)

    do_gray = jax.random.bernoulli(k_gray, grayscale_prob, (b,))
    x = jnp.where(do_gray[:, None, None, None, None], rgb_to_grayscale(x), x)

    x = adaptive_time_mask(x, k_mask, window=time_mask_window,
                           stride=time_mask_stride, lengths=lengths)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)[:, None, None]
    std = jnp.asarray(IMAGENET_STD, jnp.float32)[:, None, None]
    x = (x - mean) / std
    if lengths is not None:
        valid = (jnp.arange(x.shape[1])[None, :]
                 < jnp.asarray(lengths).reshape(b)[:, None])
        x = x * valid[:, :, None, None, None]
    return x
