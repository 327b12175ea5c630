"""On-device augmentation ops: semantics match the host numpy transforms."""

import numpy as np
import jax
import jax.numpy as jnp

from mocov2_whisper_flamingo_tpu.ops import augment


def test_spec_augment_masks_shape_and_count(rng):
    mel = jnp.ones((240, 80))
    out = np.asarray(augment.spec_augment(mel, jax.random.PRNGKey(0)))
    zero_cols = (out == 0).all(axis=0).sum()
    zero_rows = (out == 0).all(axis=1).sum()
    assert 40 <= zero_cols <= 96   # up to 2x48-bin freq masks
    assert 30 <= zero_rows <= 60   # 2x 240//8 time masks


def test_spec_augment_batched(rng):
    mel = jnp.ones((3, 240, 80))
    out = np.asarray(augment.spec_augment(mel, jax.random.PRNGKey(1)))
    assert out.shape == (3, 240, 80)
    # different examples get different masks
    assert not np.array_equal(out[0], out[1])


def test_add_noise_snr_matches_numpy(rng):
    from mocov2_whisper_flamingo_tpu.datamodule.transforms import add_noise_snr as np_impl

    sig = rng.standard_normal((4, 100)).astype(np.float32)
    noise = rng.standard_normal(100).astype(np.float32)
    ours = np.asarray(augment.add_noise_snr(jnp.asarray(sig), jnp.asarray(noise), 5.0))
    ref = np_impl(sig, noise, 5.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_add_babble_noise_batched(rng):
    mel = jnp.asarray(rng.standard_normal((2, 3000, 80)).astype(np.float32))
    bed = jnp.asarray(rng.standard_normal(160000).astype(np.float32))
    out = augment.add_babble_noise(mel, bed, jax.random.PRNGKey(0))
    assert out.shape == mel.shape
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(mel))


def test_adaptive_time_mask_video(rng):
    video = jnp.ones((2, 100, 3, 8, 8))
    out = np.asarray(augment.adaptive_time_mask(video, jax.random.PRNGKey(2)))
    # whole frames zeroed, identically across batch (per-clip masks would use
    # separate keys via vmap)
    frame_zero = (out == 0).all(axis=(0, 2, 3, 4))
    assert frame_zero.any()
    assert not frame_zero.all()


def test_train_audio_pipeline_jits(rng):
    mel = jnp.asarray(rng.standard_normal((2, 80, 500)).astype(np.float32))
    bed = jnp.asarray(rng.standard_normal(60000).astype(np.float32))
    f = jax.jit(lambda m, k: augment.train_audio_pipeline(m, k, noise_bed=bed))
    out = f(mel, jax.random.PRNGKey(0))
    assert out.shape == (2, 3000, 80)
    out_np = np.asarray(out)
    assert np.isfinite(out_np).all()
    # globally layer-normed per example
    assert abs(out_np[0].mean()) < 1e-4 and abs(out_np[0].std() - 1) < 1e-2
