"""Serve transcription over HTTP with dynamic batching.

    python -m mocov2_whisper_flamingo_tpu.tools.serve \
        --model whisper-base --checkpoint ckpt/ --tokenizer TW_tokenizer \
        --host 0.0.0.0 --port 8000 --buckets 1,2,4,8,16 --max-wait-ms 5

New capability — the reference has no serving surface (its inference paths
are the Lightning eval loop, reference: train.py:172-216, and a bit-rotted
ONNX export). Requests are micro-batched into static bucket shapes and run
through the jitted beam decode (serving/engine.py); all buckets are
pre-compiled at startup so live traffic never waits on XLA.

    curl -s localhost:8000/v1/transcribe \
        -d '{"audio": [0.0, 0.01, ...]}'     # 16 kHz float samples
    curl -s localhost:8000/metrics
"""

from __future__ import annotations

import argparse
import sys


def build_engine(args):
    import jax
    import numpy as np

    from mocov2_whisper_flamingo_tpu.models.asr import WhisperASR
    from mocov2_whisper_flamingo_tpu.serving import (
        canonical_wav, make_audio_engine)
    from mocov2_whisper_flamingo_tpu.utils.tokenizer import load_tokenizer

    tokenizer = load_tokenizer(args.tokenizer, language=args.language,
                               task=args.task)
    model = WhisperASR(args.model)
    if args.checkpoint:
        from mocov2_whisper_flamingo_tpu.tools.evaluate import restore_params

        params = restore_params(
            args.checkpoint, model.init(jax.random.PRNGKey(0)))
    else:
        params = model.init(jax.random.PRNGKey(0))

    logit_rules = None
    if args.generation_config:
        import json

        from mocov2_whisper_flamingo_tpu.decode import LogitRules

        with open(args.generation_config, encoding="utf-8") as f:
            logit_rules = LogitRules.for_whisper(
                json.load(f), model.config.vocab_size)

    buckets = tuple(int(b) for b in args.buckets.split(","))
    engine = make_audio_engine(
        model, params, list(tokenizer.prefix_token_ids),
        tokenizer=tokenizer, beam_size=args.beam_size, max_len=args.max_len,
        eos_id=int(tokenizer.eos_token_id), logit_rules=logit_rules,
        buckets=buckets, max_wait_s=args.max_wait_ms / 1e3)
    if not args.no_warmup:
        print(f"[serve] warming {len(buckets)} buckets "
              f"{buckets} ...", file=sys.stderr)
        engine.warmup((canonical_wav(np.zeros(16_000, np.float32)),))
        print("[serve] warm", file=sys.stderr)
    return engine


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--model", default="whisper-base")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--random-init", action="store_true",
                        help="random weights (smoke runs; no checkpoint)")
    parser.add_argument("--tokenizer", default=None)
    parser.add_argument("--language", default="vietnamese")
    parser.add_argument("--task", default="transcribe",
                        choices=("transcribe", "translate"))
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--max-len", type=int, default=224)
    parser.add_argument("--generation-config", default=None)
    parser.add_argument("--buckets", default="1,2,4,8,16",
                        help="batch bucket ladder (one XLA compile each)")
    parser.add_argument("--max-wait-ms", type=float, default=5.0,
                        help="micro-batch deadline: how long a request may "
                             "wait for co-batchable traffic")
    parser.add_argument("--no-warmup", action="store_true")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args(argv)
    if not args.checkpoint and not args.random_init:
        parser.error("need --checkpoint (or --random-init for smoke runs)")

    from mocov2_whisper_flamingo_tpu.serving import TranscriptionServer

    engine = build_engine(args)
    with TranscriptionServer(engine, host=args.host, port=args.port) as srv:
        host, port = srv.address
        print(f"[serve] listening on http://{host}:{port}", file=sys.stderr)
        try:
            import time

            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            print("[serve] shutting down", file=sys.stderr)
    engine.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
