"""MoCo-v2 lip-video frontend: 3D-conv stem + ResNet-50 body, TPU-native.

Capability parity with the reference frontend (reference:
moco_visual_frontend.py:9-52): a Conv3d(3->64, k=(5,3,3), s=(1,2,2),
p=(2,3,3)) + BN + ReLU + MaxPool3d(k=(1,3,3), s=(1,2,2), p=(0,1,1)) stem
standing in for the (identity-replaced) ResNet-50 stem, then the torchvision
ResNet-50 body (layer1..layer4 + global average pool) applied frame-wise,
with features past ``x_len`` zeroed.

TPU-first differences from the torch version:
- channels-last (NDHWC / NHWC) layouts so XLA tiles convs onto the MXU
  without transposes;
- the whole [B, T] frame axis is folded into the batch for the 2D body —
  one big conv batch instead of a per-frame loop;
- BatchNorm runs in inference mode (scale/shift from running stats) since the
  backbone is frozen in the reference (reference: av_net.py:45-46); the
  scale/shift is precomputable and XLA folds it into the conv.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mocov2_whisper_flamingo_tpu.models import layers as L

# torchvision ResNet-50 stage spec: (blocks, mid_channels, stride).
RESNET50_STAGES = (
    (3, 64, 1),   # layer1: in 64  -> out 256
    (4, 128, 2),  # layer2: in 256 -> out 512
    (6, 256, 2),  # layer3: in 512 -> out 1024
    (3, 512, 2),  # layer4: in 1024-> out 2048
)
EXPANSION = 4


def _conv_init(key, kh, kw, c_in, c_out, dtype=jnp.float32):
    # He/Kaiming normal fan-out (torchvision ResNet conv init).
    fan_out = kh * kw * c_out
    std = math.sqrt(2.0 / fan_out)
    return {"kernel": jax.random.normal(key, (kh, kw, c_in, c_out), dtype) * std}


def _bn_init(c, dtype=jnp.float32):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def batch_norm_inference(params: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Frozen-backbone BN: y = (x - mean) / sqrt(var + eps) * scale + bias,
    computed as one fused multiply-add in the compute dtype."""
    inv = jax.lax.rsqrt(params["var"].astype(jnp.float32) + eps)
    w = (params["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    b = (params["bias"].astype(jnp.float32)
         - params["mean"].astype(jnp.float32) * params["scale"].astype(jnp.float32) * inv
         ).astype(x.dtype)
    return x * w + b


def _fold_bn(conv: dict, bn: dict, eps: float = 1e-5):
    """Fold frozen-BN affine into the conv kernel (exact: BN after a conv is
    a per-output-channel affine, which commutes into the kernel). Folding in
    fp32 then casting once matches the unfolded numerics to bf16 rounding.

    The backbone is frozen (reference: av_net.py:45-46), so this is pure
    algebra, and it matters on TPU: BN-as-elementwise materialized a full
    activation round-trip per conv (the conv custom call cannot fuse
    consumers) — ~8.5 ms/batch of pure elementwise traffic at bench shapes.
    """
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + eps)
    s = bn["scale"].astype(jnp.float32) * inv
    b = bn["bias"].astype(jnp.float32) - bn["mean"].astype(jnp.float32) * s
    w = conv["kernel"].astype(jnp.float32) * s  # broadcast over out-channels
    return w, b


def _conv2d(params: dict, x: jnp.ndarray, stride: int, precision: L.Precision) -> jnp.ndarray:
    """Plain NHWC conv (no BN fold) — the torch-parity-tested primitive."""
    w = precision.cast(params["kernel"])
    kh = w.shape[0]
    pad = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        precision.cast(x), w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=w.dtype,
    )


# Run 1x1 convs as [N*H*W, C] matmuls (dot-epilogue fusion of bias/relu).
# Default OFF: the matmul-specialized program was observed to FAULT the TPU
# worker on the axon backend (kernel fault -> ~30 min tunnel recovery),
# while the plain-conv formulation runs fine. Re-enable only after
# validating on the target runtime.
USE_MATMUL_1X1 = False


def _conv2d_bn(conv: dict, bn: dict, x: jnp.ndarray, stride: int,
               precision: L.Precision) -> jnp.ndarray:
    """conv + folded frozen BN (one bias add instead of a BN elementwise
    pass per conv). With ``USE_MATMUL_1X1``, 1x1 kernels run as a single
    matmul over [N*H*W, C] so XLA can fuse the bias/relu into the dot
    epilogue (the TPU convolution custom call cannot fuse consumers)."""
    w, b = _fold_bn(conv, bn)
    w = precision.cast(w)
    b = precision.cast(b)
    kh = w.shape[0]
    if kh == 1 and USE_MATMUL_1X1:
        x = precision.cast(x)
        if stride != 1:
            x = x[:, ::stride, ::stride]  # 1x1 conv + stride == subsample
        n, h_, w_, c = x.shape
        out = jnp.matmul(x.reshape(n * h_ * w_, c), w[0, 0],
                         preferred_element_type=w.dtype)
        return out.reshape(n, h_, w_, -1) + b
    return _conv2d({"kernel": w}, x, stride, precision) + b


class ResNet50Body:
    """ResNet-50 without stem and fc (both Identity in the reference,
    reference: moco_visual_frontend.py:20-26): input [N, H, W, 64] feature
    maps -> [N, 2048] pooled features."""

    def __init__(self, precision: L.Precision = L.FP32):
        self.precision = precision

    def init(self, key: jax.Array) -> dict:
        params = {}
        c_in = 64
        for stage_idx, (blocks, mid, stride) in enumerate(RESNET50_STAGES, start=1):
            stage = []
            for b in range(blocks):
                key, k1, k2, k3, kd = jax.random.split(key, 5)
                s = stride if b == 0 else 1
                c_out = mid * EXPANSION
                block = {
                    "conv1": _conv_init(k1, 1, 1, c_in, mid),
                    "bn1": _bn_init(mid),
                    "conv2": _conv_init(k2, 3, 3, mid, mid),
                    "bn2": _bn_init(mid),
                    "conv3": _conv_init(k3, 1, 1, mid, c_out),
                    "bn3": _bn_init(c_out),
                }
                if b == 0 and (s != 1 or c_in != c_out):
                    block["downsample"] = {
                        "conv": _conv_init(kd, 1, 1, c_in, c_out),
                        "bn": _bn_init(c_out),
                    }
                stage.append(block)
                c_in = c_out
            params[f"layer{stage_idx}"] = stage
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, H, W, 64] -> [N, 2048]."""
        prec = self.precision
        for stage_idx, (_, _, stride) in enumerate(RESNET50_STAGES, start=1):
            for b, block in enumerate(params[f"layer{stage_idx}"]):
                if isinstance(block, str):  # skip metadata entries
                    continue
                s = stride if b == 0 else 1
                identity = x
                h = jax.nn.relu(_conv2d_bn(block["conv1"], block["bn1"], x, 1, prec))
                h = jax.nn.relu(_conv2d_bn(block["conv2"], block["bn2"], h, s, prec))
                h = _conv2d_bn(block["conv3"], block["bn3"], h, 1, prec)
                if "downsample" in block:
                    identity = _conv2d_bn(block["downsample"]["conv"],
                                          block["downsample"]["bn"], identity, s, prec)
                x = jax.nn.relu(h + identity)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> [N, 2048]


class MoCoVisualFrontend:
    """3D stem + frame-wise ResNet-50 body. API mirrors the reference
    (reference: moco_visual_frontend.py:29-52): ``apply(params, video, x_len)``
    with video [B, T, C, H, W] (torch layout preserved at the boundary)
    returning [B, T, 2048] with padded frames zeroed."""

    OUT_DIM = 2048

    def __init__(self, precision: L.Precision = L.FP32):
        self.precision = precision
        self.body = ResNet50Body(precision)

    def init(self, key: jax.Array) -> dict:
        k_stem, k_body = jax.random.split(key)
        fan_out = 5 * 3 * 3 * 64
        std = math.sqrt(2.0 / fan_out)
        return {
            "stem_conv": {"kernel": jax.random.normal(k_stem, (5, 3, 3, 3, 64)) * std},
            "stem_bn": _bn_init(64),
            "body": self.body.init(k_body),
        }

    def apply(self, params: dict, video: jnp.ndarray, x_len: jnp.ndarray) -> jnp.ndarray:
        prec = self.precision
        b, t = video.shape[0], video.shape[1]
        x = jnp.transpose(video, (0, 1, 3, 4, 2))  # [B, T, H, W, C] channels-last
        w, bias = _fold_bn(params["stem_conv"], params["stem_bn"])
        w = prec.cast(w)
        x = prec.cast(x)
        # Conv3d(k=(5,3,3), s=(1,2,2), p=(2,3,3)) expressed as a 2D conv
        # over time-unfolded features: out[t] = sum_kd conv2d(x[t+kd-2],
        # w[kd]) == conv2d(concat_kd x[t+kd-2], w_folded). Exact same math;
        # the NDHWC Conv3d lowering on TPU inserted ~3.6 ms of relayout
        # copies around the conv, while NHWC 2D convs (the ResNet body's
        # bread and butter) lower clean. Feature order is kd-major/cin-minor
        # on both sides.
        kd = w.shape[0]
        xp = jnp.pad(x, ((0, 0), (kd // 2, kd // 2), (0, 0), (0, 0), (0, 0)))
        x5 = jnp.concatenate([xp[:, dt:dt + t] for dt in range(kd)], axis=-1)
        kh, kw = w.shape[1], w.shape[2]
        w2 = w.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kd * w.shape[3], -1)
        hh, ww = x5.shape[2], x5.shape[3]
        x = jax.lax.conv_general_dilated(
            x5.reshape(b * t, hh, ww, x5.shape[-1]), w2,
            window_strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=w.dtype,
        )
        x = jax.nn.relu(x + prec.cast(bias))
        # MaxPool3d k=(1,3,3) s=(1,2,2) p=(0,1,1) — time window is 1, so the
        # 2D pool over the folded [B*T] batch is identical.
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 1),
            window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        feats = self.body.apply(params["body"], x)
        feats = feats.reshape(b, t, self.OUT_DIM)
        # Zero features past each sequence's length (reference:
        # moco_visual_frontend.py:42,49).
        valid = jnp.arange(t)[None, :] < x_len[:, None]
        return jnp.where(valid[..., None], feats, 0.0)
