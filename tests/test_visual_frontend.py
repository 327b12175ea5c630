"""Visual frontend tests: conv/BN/pool primitive parity vs torch (the MoCo
checkpoint converter relies on these exact semantics), plus shape/mask
behavior of the full frontend (reference: moco_visual_frontend.py:29-52)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.models import layers as L
from mocov2_whisper_flamingo_tpu.models.visual_frontend import (
    MoCoVisualFrontend,
    ResNet50Body,
    batch_norm_inference,
    _conv2d,
)

torch = pytest.importorskip("torch")


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 9, 9, 8)).astype(np.float32)  # NHWC
    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)  # HWIO

    ours = np.asarray(_conv2d({"kernel": jnp.asarray(w)}, jnp.asarray(x), 2, L.FP32))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    ref = torch.nn.functional.conv2d(xt, wt, stride=2, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_batch_norm_inference_matches_torch(rng):
    c = 12
    x = rng.standard_normal((4, 5, 5, c)).astype(np.float32)
    params = {
        "scale": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
        "bias": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
        "mean": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
        "var": jnp.asarray(np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5),
    }
    ours = np.asarray(batch_norm_inference(params, jnp.asarray(x)))

    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(params["mean"])))
        bn.running_var.copy_(torch.from_numpy(np.asarray(params["var"])))
        ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_stem_matches_torch(rng):
    """3D conv stem + maxpool parity: Conv3d(3->64, k=(5,3,3), s=(1,2,2),
    p=(2,3,3)) + BN(identity stats) + ReLU + MaxPool3d(k=(1,3,3), s=(1,2,2),
    p=(0,1,1))."""
    b, t, h, w = 1, 4, 32, 32
    video = rng.standard_normal((b, t, 3, h, w)).astype(np.float32)
    kernel = (rng.standard_normal((5, 3, 3, 3, 64)).astype(np.float32) * 0.1)

    frontend = MoCoVisualFrontend()
    params = frontend.init(jax.random.PRNGKey(0))
    params["stem_conv"]["kernel"] = jnp.asarray(kernel)

    # Run just the stem by probing through apply on a body of zeros? Instead
    # replicate the stem math here via torch and compare the pooled feature
    # shape/values up to the body by monkey-patching the body to identity.
    prec = L.FP32
    x = jnp.transpose(jnp.asarray(video), (0, 1, 3, 4, 2))
    xj = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel), window_strides=(1, 2, 2),
        padding=[(2, 2), (3, 3), (3, 3)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    xj = jax.nn.relu(xj)
    xj = jax.lax.reduce_window(
        xj, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 3, 3, 1), window_strides=(1, 1, 2, 2, 1),
        padding=((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    ours = np.asarray(xj)

    vt = torch.from_numpy(video.transpose(0, 2, 1, 3, 4))  # [B, C, T, H, W]
    wt = torch.from_numpy(kernel.transpose(4, 3, 0, 1, 2))  # [out, in, kd, kh, kw]
    ref = torch.nn.functional.conv3d(vt, wt, stride=(1, 2, 2), padding=(2, 3, 3))
    ref = torch.relu(ref)
    ref = torch.nn.functional.max_pool3d(ref, kernel_size=(1, 3, 3), stride=(1, 2, 2),
                                         padding=(0, 1, 1))
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)  # -> NDHWC
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)


def test_frontend_shapes_and_masking(rng):
    frontend = MoCoVisualFrontend()
    params = frontend.init(jax.random.PRNGKey(0))
    video = jnp.asarray(rng.standard_normal((2, 6, 3, 64, 64)).astype(np.float32))
    x_len = jnp.asarray([6, 3])
    out = frontend.apply(params, video, x_len)
    assert out.shape == (2, 6, 2048)
    out_np = np.asarray(out)
    assert np.all(np.isfinite(out_np))
    # Frames past x_len are zeroed (reference: moco_visual_frontend.py:49).
    assert np.all(out_np[1, 3:] == 0.0)
    assert np.any(out_np[1, :3] != 0.0)


def test_resnet_body_64x64_pipeline_shape(rng):
    """64x64 input -> stem 17x17 -> body stages 17->9->5->3 -> pool [N,2048]."""
    body = ResNet50Body()
    params = body.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.standard_normal((3, 17, 17, 64)).astype(np.float32))
    out = body.apply(params, x)
    assert out.shape == (3, 2048)
    assert np.all(np.isfinite(np.asarray(out)))


def test_moco_converter_key_mapping(rng):
    """The MoCo-v2 'module.encoder_q.*' key schema lands in the right params
    and strict=False semantics keep init values for missing keys."""
    from mocov2_whisper_flamingo_tpu.models.convert import resnet50_from_moco

    body = ResNet50Body()
    init = body.init(jax.random.PRNGKey(2))

    # Build a fake MoCo checkpoint covering only layer1.0.
    fake = {}
    pfx = "module.encoder_q.layer1.0"
    for i, (cin, cout, k) in enumerate([(64, 64, 1), (64, 64, 3), (64, 256, 1)], start=1):
        fake[f"{pfx}.conv{i}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        for stat, shape in [("weight", cout), ("bias", cout), ("running_mean", cout),
                            ("running_var", cout)]:
            fake[f"{pfx}.bn{i}.{stat}"] = rng.standard_normal(shape).astype(np.float32)
    fake[f"{pfx}.downsample.0.weight"] = rng.standard_normal((256, 64, 1, 1)).astype(np.float32)
    for stat in ["weight", "bias", "running_mean", "running_var"]:
        fake[f"{pfx}.downsample.1.{stat}"] = rng.standard_normal(256).astype(np.float32)

    out = resnet50_from_moco({"state_dict": fake}, init)
    report = out.pop("_conversion_report")
    assert report["blocks_loaded"] == 1
    # layer1.0 conv1 now matches the checkpoint (transposed to HWIO)...
    np.testing.assert_allclose(
        out["layer1"][0]["conv1"]["kernel"],
        fake[f"{pfx}.conv1.weight"].transpose(2, 3, 1, 0))
    # ...while untouched blocks keep their init values.
    np.testing.assert_allclose(
        np.asarray(out["layer2"][0]["conv1"]["kernel"]),
        np.asarray(init["layer2"][0]["conv1"]["kernel"]))


def test_conv2d_bn_fold_matches_unfolded(rng, monkeypatch):
    """_conv2d_bn (BN folded into the kernel; 1x1 kernels as matmuls) must
    match conv-then-BN to fp tolerance, including the strided-1x1
    (downsample) subsample path.

    The module-level USE_MATMUL_1X1 flag is flipped via monkeypatch so a
    mid-loop assertion failure can never leak True into other tests (the
    default is deliberately False: that formulation faulted the axon TPU
    worker — CLAUDE.md)."""
    from mocov2_whisper_flamingo_tpu.models import visual_frontend as vf

    _conv2d_bn = vf._conv2d_bn
    for kh, stride in [(1, 1), (1, 2), (3, 1), (3, 2)]:
        c_in, c_out = 8, 16
        conv = {"kernel": jnp.asarray(rng.standard_normal((kh, kh, c_in, c_out)), jnp.float32) * 0.1}
        bn = {
            "scale": jnp.asarray(rng.standard_normal(c_out), jnp.float32) * 0.5 + 1.0,
            "bias": jnp.asarray(rng.standard_normal(c_out), jnp.float32),
            "mean": jnp.asarray(rng.standard_normal(c_out), jnp.float32) * 0.1,
            "var": jnp.asarray(rng.random(c_out), jnp.float32) + 0.5,
        }
        x = jnp.asarray(rng.standard_normal((2, 12, 12, c_in)), jnp.float32)
        ref = batch_norm_inference(bn, _conv2d(conv, x, stride, L.FP32))
        monkeypatch.setattr(vf, "USE_MATMUL_1X1", True)
        got = _conv2d_bn(conv, bn, x, stride, L.FP32)
        monkeypatch.setattr(vf, "USE_MATMUL_1X1", False)
        got_conv = _conv2d_bn(conv, bn, x, stride, L.FP32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"kh={kh} stride={stride}")
        np.testing.assert_allclose(np.asarray(got_conv), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"conv path kh={kh} stride={stride}")


def test_stem_time_unfold_matches_conv3d(rng):
    """The stem's time-unfolded 2D-conv formulation (apply path) must equal
    the direct Conv3d it replaces, bit-for-fp-tolerance, including the
    temporal zero padding at clip edges."""
    b, t, h, w = 2, 6, 16, 16
    video = rng.standard_normal((b, t, 3, h, w)).astype(np.float32)
    kernel = (rng.standard_normal((5, 3, 3, 3, 64)).astype(np.float32) * 0.1)

    x = jnp.transpose(jnp.asarray(video), (0, 1, 3, 4, 2))
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel), window_strides=(1, 2, 2),
        padding=[(2, 2), (3, 3), (3, 3)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))
    x5 = jnp.concatenate([xp[:, dt:dt + t] for dt in range(5)], axis=-1)
    w2 = jnp.asarray(kernel).transpose(1, 2, 0, 3, 4).reshape(3, 3, 15, 64)
    hh, ww = x5.shape[2], x5.shape[3]
    got = jax.lax.conv_general_dilated(
        x5.reshape(b * t, hh, ww, 15), w2, window_strides=(2, 2),
        padding=[(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = got.reshape(b, t, *got.shape[1:])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
