"""On-device video preprocessing ops vs host/torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.ops import video as V


def test_center_crop(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 3, 96, 96)).astype(np.float32))
    out = V.center_crop(x, 64)
    assert out.shape == (2, 4, 3, 64, 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[..., 16:80, 16:80])


def test_resize_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((3, 3, 48, 40)).astype(np.float32)
    ours = np.asarray(V.resize_bilinear(jnp.asarray(x), 64))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(64, 64), mode="bilinear", align_corners=False,
        antialias=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_normalize_matches_host(rng):
    from mocov2_whisper_flamingo_tpu.datamodule.transforms import (
        IMAGENET_MEAN, IMAGENET_STD)

    x = rng.integers(0, 255, (2, 3, 8, 8)).astype(np.float32)
    ours = np.asarray(V.normalize(jnp.asarray(x)))
    ref = (x / 255.0 - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_eval_pipeline_matches_video_transform(rng):
    """Device eval path == host VideoTransform('val') (which skips resize)."""
    from mocov2_whisper_flamingo_tpu.datamodule.transforms import VideoTransform

    x = rng.integers(0, 255, (4, 3, 96, 96)).astype(np.uint8)
    host = VideoTransform("val")(x)
    device = np.asarray(V.eval_video_pipeline(jnp.asarray(x)))
    np.testing.assert_allclose(device, host, atol=1e-4)


def test_train_pipeline_shapes_and_jit(rng):
    frames = jnp.asarray(rng.integers(0, 255, (2, 6, 3, 96, 96)).astype(np.float32))
    f = jax.jit(lambda x, k: V.train_video_pipeline(x, k))
    out = f(frames, jax.random.PRNGKey(0))
    assert out.shape == (2, 6, 3, 64, 64)
    assert np.isfinite(np.asarray(out)).all()
    # stochastic: different keys differ
    out2 = f(frames, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_grayscale(rng):
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 4)).astype(np.float32))
    g = V.rgb_to_grayscale(x)
    assert g.shape == x.shape
    np.testing.assert_allclose(np.asarray(g[0, 0]), np.asarray(g[0, 1]))


def test_color_jitter_matches_host_math(rng):
    """Device ColorJitter (fixed b->c->s->h order) == the host per-op math
    (transforms.py:241-267, itself torch-parity) applied in that order with
    the same injected factors."""
    from mocov2_whisper_flamingo_tpu.datamodule import transforms as T

    x = rng.random((2, 3, 3, 8, 8)).astype(np.float32)  # [B, T, C, H, W]
    fb, fc, fs = np.array([0.7, 1.3]), np.array([1.2, 0.8]), np.array([0.6, 1.4])
    hs = np.array([0.05, -0.08])

    ours = np.asarray(V.color_jitter_with_factors(
        jnp.asarray(x), jnp.asarray(fb), jnp.asarray(fc), jnp.asarray(fs),
        jnp.asarray(hs)))

    for b in range(2):
        ref = np.clip(x[b] * fb[b], 0, 1)
        gray = 0.299 * ref[:, 0] + 0.587 * ref[:, 1] + 0.114 * ref[:, 2]
        mean = gray.mean(axis=(-2, -1), keepdims=True)[:, None]
        ref = np.clip(fc[b] * ref + (1 - fc[b]) * mean, 0, 1)
        gray = (0.299 * ref[:, 0] + 0.587 * ref[:, 1] + 0.114 * ref[:, 2])[:, None]
        ref = np.clip(fs[b] * ref + (1 - fs[b]) * gray, 0, 1)
        hsv = T._rgb_to_hsv(ref)
        hsv[..., 0, :, :] = (hsv[..., 0, :, :] + hs[b]) % 1.0
        ref = np.clip(T._hsv_to_rgb(hsv), 0, 1)
        np.testing.assert_allclose(ours[b], ref, atol=1e-5)


def test_train_pipeline_deterministic_branches(rng):
    """flip_prob=1 flips, grayscale_prob=1 grays, jitter=None inert: the
    composed pipeline equals the hand-applied host ops."""
    from mocov2_whisper_flamingo_tpu.datamodule.transforms import (
        IMAGENET_MEAN, IMAGENET_STD)

    x = rng.integers(0, 255, (1, 4, 3, 96, 96)).astype(np.float32)
    out = np.asarray(V.train_video_pipeline(
        jnp.asarray(x), jax.random.PRNGKey(0), resize=64, flip_prob=1.0,
        jitter=None, grayscale_prob=1.0, time_mask_window=0, time_mask_stride=10**9))

    ref = np.asarray(V.resize_bilinear(jnp.asarray(x), 64)) / 255.0
    ref = ref[..., ::-1]
    gray = 0.299 * ref[:, :, 0] + 0.587 * ref[:, :, 1] + 0.114 * ref[:, :, 2]
    ref = np.repeat(gray[:, :, None], 3, axis=2)
    ref = (ref - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
    np.testing.assert_allclose(out, ref, atol=1e-4)
