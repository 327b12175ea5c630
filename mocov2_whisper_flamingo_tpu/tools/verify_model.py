#!/usr/bin/env python
"""Model verification: stability, memory, and shape sweeps.

Capability parity with the reference verifier (reference: verify_model.py):
- ``test_model_stability``: forward across modality configurations
  (AV / AO / VO), NaN/Inf scan on the logits (reference: verify_model.py:9-52);
- ``test_memory_usage``: forward+backward peak device memory via
  ``jax.local_devices()[0].memory_stats()`` (the TPU analog of
  torch.cuda.memory_allocated, reference: verify_model.py:54-109);
- ``test_input_shapes``: forward on synthetic tensors at several
  (batch, audio_len, video_len) combos (reference: verify_model.py:111-144).

Unlike the reference (which bit-rotted against its own model signature —
SURVEY.md §2.1), this version is exercised in CI by tests/test_tools.py.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

logger = logging.getLogger("verify_model")


def _make_batch(rng, b, t_audio, t_video, hw=64, modality="audiovisual"):
    import jax.numpy as jnp

    audio = jnp.asarray(rng.standard_normal((b, 3000, 80)), jnp.float32)
    if modality == "video":
        audio = jnp.zeros_like(audio)
    audio_mask = jnp.asarray(np.arange(3000)[None] < t_audio * np.ones((b, 1)))
    video = jnp.asarray(rng.standard_normal((b, t_video, 3, hw, hw)), jnp.float32)
    if modality == "audio":
        video = jnp.zeros_like(video)
    video_mask = jnp.ones((b, t_video), bool)
    video_len = jnp.full((b,), t_video, jnp.int32)
    return (audio, audio_mask, video, video_mask, video_len)


def test_model_stability(net, params, rng=None, modalities=("audiovisual", "audio", "video")) -> dict:
    """Forward under each modality pattern; scan outputs for NaN/Inf."""
    import jax
    import jax.numpy as jnp

    rng = rng or np.random.default_rng(0)
    results = {}
    fwd = jax.jit(lambda p, b: net.forward(p, b))
    for modality in modalities:
        batch = _make_batch(rng, 2, 2400, 16, modality=modality)
        logits = fwd(params, batch)
        finite = bool(jnp.all(jnp.isfinite(logits)))
        results[modality] = {
            "finite": finite,
            "shape": tuple(logits.shape),
            "logit_range": (float(jnp.min(logits)), float(jnp.max(logits))),
        }
        status = "OK" if finite else "FAILED (NaN/Inf)"
        logger.info("modality=%s %s shape=%s", modality, status, logits.shape)
    return results


def test_memory_usage(net, params, rng=None) -> dict:
    """Forward + backward, report device memory stats when the backend
    exposes them (TPU does; CPU returns zeros)."""
    import jax
    import jax.numpy as jnp

    rng = rng or np.random.default_rng(0)
    batch = _make_batch(rng, 2, 2400, 16)

    def loss(p):
        return jnp.sum(net.forward(p, batch) ** 2) * 1e-9

    grads = jax.jit(jax.grad(loss))(params)
    jax.block_until_ready(grads)
    dev = jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    report = {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "grads_finite": bool(all(np.isfinite(np.asarray(g)).all()
                                 for g in jax.tree.leaves(grads))),
    }
    logger.info("memory: %s", report)
    return report


def test_input_shapes(net, params, rng=None,
                      combos=((1, 500, 8), (2, 1000, 12), (4, 750, 10))) -> dict:
    """Forward at several (B, audio_valid_len, T_video) shapes."""
    import jax

    rng = rng or np.random.default_rng(0)
    results = {}
    for b, t_audio, t_video in combos:
        batch = _make_batch(rng, b, t_audio, t_video)
        logits = jax.jit(lambda p, bt: net.forward(p, bt))(params, batch)
        results[(b, t_audio, t_video)] = tuple(logits.shape)
        logger.info("shapes (B=%d, Ta=%d, Tv=%d) -> %s", b, t_audio, t_video, logits.shape)
    return results


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    from mocov2_whisper_flamingo_tpu.config import add_config_flags, config_from_args

    add_config_flags(parser)
    parser.add_argument("--tiny", action="store_true",
                        help="tiny whisper encoder for quick runs")
    args = parser.parse_args()
    config = config_from_args(args)

    logging.basicConfig(level=logging.INFO)
    import jax

    from train import build_net

    if args.tiny:
        config.set_dotted("whisper.model_name", "whisper-tiny")
        config.set_dotted("model.d_model", 64)
        config.set_dotted("model.n_heads", 4)
        config.set_dotted("model.fc_hidden_size", 128)

    net, params = build_net(config, vocab_size=51865)
    stability = test_model_stability(net, params)
    memory = test_memory_usage(net, params)
    shapes = test_input_shapes(net, params)

    ok = all(r["finite"] for r in stability.values()) and memory["grads_finite"]
    print("VERIFY:", "PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
