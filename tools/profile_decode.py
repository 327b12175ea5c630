"""Capture a jax.profiler trace of the beam-decode step and print a
kernel-time breakdown (used to drive the round-2 decode work: found the
~50 us/leaf cache-reorder relayout copies that ancestry-mask attention
eliminated, 2.76 -> 0.98 ms/step).

Usage: python tools/profile_decode.py [--outdir /tmp/decode_prof]
Writes a TensorBoard-loadable trace and prints the top ops by self time
parsed from the trace's .xplane.pb (best-effort; falls back to just the
trace path if the xplane schema is unavailable).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", default="/tmp/decode_prof")
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--batch", type=int, default=None,
                        help="override the bench batch size (serving buckets)")
    parser.add_argument("--cache-quant", default=None,
                        choices=(None, "int8", "int8-cross"),
                        help="KV-cache quantization for the profiled decode")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import B as B_DEFAULT, BEAM, EOS, PREFIX, _build, _make_batch, _preprocess

    B = args.batch or B_DEFAULT
    net, params = _build("whisper-small")
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, B)

    # Isolate the decode loop: precompute encoder features once.
    encode = jax.jit(lambda p, bt: net.encode(p, _preprocess(bt)))
    feats, valid = encode(params, batch)
    jax.block_until_ready(feats)

    from mocov2_whisper_flamingo_tpu.decode.beam import beam_search

    max_len = len(PREFIX) + args.steps
    dec_params = net._decode_params(params)
    decode = jax.jit(lambda dp, f, v: beam_search(
        net.decoder, dp, f, PREFIX, beam_size=BEAM, max_len=max_len,
        eos_id=EOS, encoder_valid=v, cache_quant=args.cache_quant).sequences)
    decode(dec_params, feats, valid).block_until_ready()  # compile

    t0 = time.perf_counter()
    for _ in range(3):
        out = decode(dec_params, feats, valid)
    out.block_until_ready()
    per_step_ms = (time.perf_counter() - t0) * 1e3 / 3 / args.steps
    print(f"decode: {per_step_ms:.3f} ms/step ({args.steps} steps, "
          f"B={B} K={BEAM})")

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        decode(dec_params, feats, valid).block_until_ready()

    print(f"trace written to {args.outdir}")
    _summarize(args.outdir, args.steps)


def _summarize(outdir: str, n_steps: int) -> None:
    """Best-effort: parse trace.json.gz events and aggregate device op time."""
    candidates = glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.trace.json.gz"))
    if not candidates:
        print("no trace.json.gz found (inspect the xplane in TensorBoard)")
        return
    with gzip.open(sorted(candidates)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device-lane complete events carry per-kernel durations in us.
    by_name: dict[str, float] = {}
    total = 0.0
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            if name.startswith(("Thread", "process_")):
                continue
            args_d = ev.get("args") or {}
            lane = str(args_d.get("device_type", "")) + str(ev.get("pid", ""))
            if "tid" in ev and isinstance(ev.get("dur"), (int, float)):
                key = name.split(".")[0][:60]
                by_name[key] = by_name.get(key, 0.0) + ev["dur"]
                total += ev["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
    print(f"top ops by accumulated time (us, total {total:.0f}):")
    for name, dur in top:
        print(f"  {dur:10.0f}  {dur / max(n_steps, 1):8.1f}/step  {name}")


if __name__ == "__main__":
    main()
