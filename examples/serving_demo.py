"""Online-serving demo — both engines over one model.

Builds a (random-init) tiny AVWhisperNet and serves it two ways:

1. **Whole-utterance engine** (`serving.make_av_engine`): dynamic
   micro-batching over power-of-two buckets — the throughput king for
   offline / saturation loads.
2. **Continuous-batching engine** (`serving.make_continuous_av_engine`):
   the decode runs as a perpetual sequence of fixed 32-step segment
   programs over a row pool; requests are admitted into free rows at
   segment boundaries, so a request arriving mid-decode waits ~one
   segment, not a full bucket decode — the engine for online
   admission-latency SLOs (docs/DESIGN.md "Latency model and continuous
   batching"; measured numbers in BASELINE.md round-5 rows).

Offline (random weights) the transcripts are noise, but the request
lifecycle — submit -> admission -> decode -> retire, with per-request
queue/decode/total latency — is the real thing.

    python examples/serving_demo.py [--cpu]

Uses tiny shapes so CPU finishes in ~2 min.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tiny_net():
    import jax

    from mocov2_whisper_flamingo_tpu.models.av_whisper import AVWhisperNet
    from mocov2_whisper_flamingo_tpu.models.whisper import (
        WhisperConfig, WhisperDecoder, WhisperEncoder)

    vocab = 64
    net = AVWhisperNet(modelargs=(32, 4, 2, 3000, 128, 0.0), vocab_size=vocab,
                       whisper_name="whisper-tiny", backend="xla")
    tiny = WhisperConfig(n_mels=80, d_model=32, encoder_layers=1,
                         decoder_layers=1, n_heads=4, d_ff=64,
                         vocab_size=vocab, max_source_positions=1500,
                         max_target_positions=64)
    net.whisper_config = tiny
    net.trunk.whisper_config = tiny
    net.trunk.whisper_encoder = WhisperEncoder(tiny, net.trunk.precision,
                                               "xla")
    net.decoder = WhisperDecoder(tiny, net.precision, "xla")
    return net, net.init(jax.random.PRNGKey(0)), vocab


def payload(rng, t_video: int = 8, hw: int = 64):
    return (
        np.asarray(rng.standard_normal((3000, 80)), np.float32),
        np.ones(3000, bool),
        rng.integers(0, 255, (t_video, 3, hw, hw)).astype(np.uint8),
        np.ones(t_video, bool),
        np.int32(t_video),
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from mocov2_whisper_flamingo_tpu.serving import (
        make_av_engine, make_continuous_av_engine)

    net, params, vocab = build_tiny_net()
    rng = np.random.default_rng(0)
    prefix, eos, max_len = [1, 2], 3, 32

    # -- 1. whole-utterance engine: batched throughput -------------------
    print("[1] whole-utterance engine (dynamic micro-batching)")
    eng = make_av_engine(net, params, prefix, beam_size=3, max_len=max_len,
                         eos_id=eos, buckets=(1, 4), video_resize=32)
    try:
        eng.warmup(payload(rng))
        futs = [eng.submit(*payload(rng)) for _ in range(4)]
        for i, f in enumerate(futs):
            r = f.result(timeout=600)
            print(f"    req{i}: bucket={r.bucket} queue={r.queue_ms:.0f}ms "
                  f"total={r.total_ms:.0f}ms tokens={[int(t) for t in r.tokens[:8]]}...")
    finally:
        eng.close()

    # -- 2. continuous engine: segment-bounded admission ------------------
    print("[2] continuous-batching engine (segment-program row pool)")
    ceng = make_continuous_av_engine(
        net, params, prefix, beam_size=3, max_len=max_len, eos_id=eos,
        capacity=4, seg_steps=8, video_resize=32)
    try:
        ceng.warmup(payload(rng), encode_buckets=(1, 2, 4))
        # Two requests now; a third arrives while they are mid-decode —
        # it is admitted at the next segment boundary, not after a full
        # bucket decode.
        futs = [ceng.submit(*payload(rng)) for _ in range(2)]
        time.sleep(0.05)
        late = ceng.submit(*payload(rng))
        for i, f in enumerate(futs):
            r = f.result(timeout=600)
            print(f"    req{i}: queue={r.queue_ms:.0f}ms "
                  f"decode={r.decode_ms:.0f}ms total={r.total_ms:.0f}ms")
        r = late.result(timeout=600)
        print(f"    late: queue={r.queue_ms:.0f}ms (admitted mid-decode) "
              f"total={r.total_ms:.0f}ms tokens={[int(t) for t in r.tokens[:8]]}...")
        print(f"    engine stats: {ceng.stats()}")
    finally:
        ceng.close()
    print("done.")


if __name__ == "__main__":
    main()
