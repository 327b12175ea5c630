"""Headline benchmark: AVSR decode real-time factor (audio-sec/sec/chip).

Measures the full AV inference path on the reference's configuration —
whisper-small encoder + MoCo ResNet-50 frontend (random weights; identical
FLOPs to pretrained) + gated cross-attn fusion + greedy argmax decode over
the linear head, which IS the reference's decode (reference:
train.py:130-141 — it has no beam search). Batch of 30 s clips at the
reference's max_frames=400 video cap.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the fraction of the 50x-per-chip north-star target
(BASELINE.md — the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mocov2_whisper_flamingo_tpu.models import layers as L
    from mocov2_whisper_flamingo_tpu.models.av_net import AVNet

    B = 4
    T_VIDEO = 400  # reference max_frames (config.py:28)
    SECONDS_PER_CLIP = 30.0  # 3000 mel frames = 30 s

    net = AVNet(
        "audiovisual", None, 96, (512, 8, 6, 3000, 2048, 0.1),
        vocab_size=51865, whisper_name="whisper-small", precision=L.BF16,
    )
    params = net.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((B, 3000, 80)), jnp.float32),
        jnp.ones((B, 3000), bool),
        jnp.asarray(rng.standard_normal((B, T_VIDEO, 3, 64, 64)), jnp.float32),
        jnp.ones((B, T_VIDEO), bool),
        jnp.full((B,), T_VIDEO, jnp.int32),
    )

    @jax.jit
    def decode(params, batch):
        logits = net.forward(params, batch)
        return jnp.argmax(logits, axis=-1)

    # Warmup/compile.
    decode(params, batch).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = decode(params, batch)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    rtf = B * SECONDS_PER_CLIP / dt
    print(json.dumps({
        "metric": "AVSR greedy decode real-time factor (audio-sec/sec/chip)",
        "value": round(rtf, 2),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
