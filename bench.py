"""Headline benchmark: AVSR decode real-time factor at beam=5
(audio-sec/sec/chip) — the BASELINE.json north-star metric.

Full AV inference path on the reference's configuration: whisper-small
encoder + MoCo ResNet-50 frontend (random weights; identical FLOPs to
pretrained) + gated cross-attn fusion (Pallas flash attention), bridged into
the Whisper decoder for KV-cached beam-search decoding (beam=5). Batch of
30 s clips at the reference's max_frames=400 video cap; decode budget 160
tokens/clip (~5 tok/s of Vietnamese; random weights never emit EOS, so this
measures the no-early-exit worst case).

Prints ONE JSON line; the headline triple is {"metric", "value", "unit",
"vs_baseline"} (vs_baseline = fraction of the 50x-per-chip target — the
reference publishes no numbers of its own, BASELINE.md). Extra keys ride in
the same object: encode/decode time split, MFU of the decode dispatch, and
the chunked-streaming (BASELINE config 5) realtime factor.

``--sizes medium,large-v2`` additionally measures the north-star scale
configs (results recorded in BASELINE.md; not part of the driver line).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

B = 4
T_VIDEO = 400          # reference max_frames (config.py:28)
SECONDS_PER_CLIP = 30.0  # 3000 mel frames
BEAM = 5
MAX_TOKENS = 160
PREFIX = [50258, 50278, 50359, 50363]  # sot, vi, transcribe, notimestamps
EOS = 50257
PEAK_BF16_FLOPS = 197e12  # TPU v5e peak dense bf16 (single chip)

STREAM_CHUNKS = 10       # 5 minutes of audio in 30 s chunks
STREAM_TOKENS_PER_CHUNK = 40


def _make_batch(rng, b: int):
    """Raw inputs: mel + RAW uint8 mouth-ROI frames (88x88). Video
    preprocessing (resize 64 + ImageNet normalize, the reference val path,
    transforms.py:93-95) runs ON DEVICE inside the measured jit via
    ops.video.eval_video_pipeline — the bench covers the full inference
    path from decoded frames."""
    import jax.numpy as jnp

    return (
        jnp.asarray(rng.standard_normal((b, 3000, 80)), jnp.float32),
        jnp.ones((b, 3000), bool),
        jnp.asarray(rng.integers(0, 255, (b, T_VIDEO, 3, 88, 88)), jnp.uint8),
        jnp.ones((b, T_VIDEO), bool),
        jnp.full((b,), T_VIDEO, jnp.int32),
    )


def _preprocess(batch):
    from mocov2_whisper_flamingo_tpu.ops.video import eval_video_pipeline

    audio, audio_mask, video_u8, video_mask, video_len = batch
    video = eval_video_pipeline(video_u8, resize=64)
    return (audio, audio_mask, video, video_mask, video_len)


def _build(whisper_name: str, backend=None):
    import jax

    from mocov2_whisper_flamingo_tpu.models import layers as L
    from mocov2_whisper_flamingo_tpu.models.av_whisper import AVWhisperNet

    net = AVWhisperNet(
        modelargs=(512, 8, 6, 3000, 2048, 0.1),
        vocab_size=51865,
        whisper_name=whisper_name,
        precision=L.BF16,
        backend=backend,
    )
    return net, net.init(jax.random.PRNGKey(0))


def _time(fn, *args, iters=5):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / iters


def _time_interleaved(fa, fb, *args, iters=5):
    """A/B timing that alternates the two programs per iteration so the
    tunnel's monotonic device-state drift (CLAUDE.md: accumulated
    transfers/compiles slow everything) biases neither leg. Each iteration
    blocks, so both legs see identical dispatch conditions; at the >1 ms
    decode dispatches measured here the per-iter sync cost is noise."""
    jax_block(fa(*args))
    jax_block(fb(*args))
    ta = tb = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        jax_block(fa(*args))
        ta += time.perf_counter() - t0
        t0 = time.perf_counter()
        jax_block(fb(*args))
        tb += time.perf_counter() - t0
    return ta / iters, tb / iters


def jax_block(tree):
    import jax

    jax.tree.map(lambda x: x.block_until_ready()
                 if hasattr(x, "block_until_ready") else x, tree)


def bench_size(whisper_name: str, b: int = B, iters: int = 5,
               cache_quant: str | None = None,
               weight_quant: str | None = None,
               read_windows=None,
               cache_layout: str = "rows"):
    """Measure one model size; returns a dict of timings.

    ``cache_quant="int8"``: int8 KV caches (models/whisper.py) — the
    bandwidth lever for the wide serving buckets where cache traffic
    dominates the decode step. ``weight_quant="int8"``: weight-only int8
    decode step (quantize_decode_params) — the bandwidth lever at
    medium/large model sizes where per-step WEIGHT traffic dominates.
    ``weight_quant="ab"``: measure BOTH bf16 and int8 decode in the same
    process on the same params (the tunneled chip shows ~20% run-to-run
    variance at medium/large — a cross-process comparison is noise);
    extra keys ``rtf_int8`` / ``decode_ms_per_step_int8`` report the
    quantized leg."""
    import jax

    ab = weight_quant == "ab"
    weight_quant = None if ab else weight_quant
    net, params = _build(whisper_name)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b)

    def make_fns(net, wq=weight_quant):
        decode = jax.jit(lambda p, bt: net.beam(
            p, _preprocess(bt), PREFIX, beam_size=BEAM, max_len=MAX_TOKENS,
            eos_id=EOS, cache_quant=cache_quant,
            weight_quant=wq, read_windows=read_windows,
            cache_layout=cache_layout).sequences)
        encode = jax.jit(lambda p, bt: net.encode(p, _preprocess(bt)))
        return decode, encode

    decode, encode = make_fns(net)
    try:
        decode(params, batch).block_until_ready()
    except Exception:
        # Pallas kernels can hit backend/toolchain regressions; the XLA
        # attention path is the measured-correct fallback.
        net, params = _build(whisper_name, backend="xla")
        decode, encode = make_fns(net)
        decode(params, batch).block_until_ready()

    dt = _time(decode, params, batch, iters=iters)
    dt_enc = _time(encode, params, batch, iters=iters)
    n_steps = MAX_TOKENS - len(PREFIX)

    flops = None
    try:
        cost = decode.lower(params, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    out = {
        "rtf": b * SECONDS_PER_CLIP / dt,
        "total_ms": dt * 1e3,
        "encode_ms": dt_enc * 1e3,
        "decode_ms_per_step": (dt - dt_enc) * 1e3 / n_steps,
        "mfu_pct": (flops / dt / PEAK_BF16_FLOPS * 100.0) if flops else None,
        "net": net,
        "params": params,
    }
    if ab:
        decode_q, _ = make_fns(net, wq="int8")
        try:
            decode_q(params, batch).block_until_ready()
        except Exception as e:
            # The bf16 numbers above still stand; record the quantized-leg
            # failure instead of aborting the per-size run (a rebuild with
            # backend="xla" would swap net/params mid-run and invalidate
            # the same-process comparison).
            out["int8_error"] = repr(e)
            return out
        # Interleave the two legs so in-process device-state drift biases
        # neither; the interleaved bf16 time is also reported so the drift
        # vs the pipelined headline measurement is bounded on record.
        dt_fp2, dt_q = _time_interleaved(decode, decode_q, params, batch,
                                         iters=iters)
        out["rtf_int8"] = b * SECONDS_PER_CLIP / dt_q
        out["decode_ms_per_step_int8"] = (dt_q - dt_enc) * 1e3 / n_steps
        out["rtf_bf16_interleaved"] = b * SECONDS_PER_CLIP / dt_fp2
        out["decode_ms_per_step_bf16_interleaved"] = (
            (dt_fp2 - dt_enc) * 1e3 / n_steps)
        # tokens must match bit-exactly: int8 weights change logit values,
        # but on this synthetic batch the argmax ordering should persist;
        # report divergence instead of asserting (real-weight tolerance is
        # covered by tests/test_decode.py).
        same = bool(np.array_equal(np.asarray(decode(params, batch)),
                                   np.asarray(decode_q(params, batch))))
        out["int8_tokens_match"] = same
    return out


def bench_streaming(net, params, long_chunks: int = 20,
                    weight_quant: str | None = None) -> tuple[float, float, int]:
    """Full-AV chunked streaming (BASELINE config 5 shape): per 30 s chunk
    one jitted AV encode + one jitted beam decode dispatch, persistent
    decoder KV cache across chunks; window rollover past the 448-token
    budget (context restart — the transcript is unbounded, nothing is
    silently truncated).

    Returns (rtf_5min, rtf_longform, longform_tokens): the steady-state
    realtime factor for 5 minutes of audio at B=1, and the 10-minute
    (``long_chunks`` x 30 s) leg that crosses ~2 window rollovers. With
    ``context_tokens=0`` a rolled window has the same prefix length as
    window 0, so the long-form leg reuses the already-compiled chunk fns
    (no mid-measurement compiles)."""
    import jax

    from mocov2_whisper_flamingo_tpu.decode.streaming import StreamingDecoder

    rng = np.random.default_rng(1)
    encode = jax.jit(lambda p, bt: net.encode(p, _preprocess(bt)))

    stream = StreamingDecoder(
        net.decoder, net._decode_params(params, weight_quant=weight_quant),
        PREFIX, max_len=448,
        eos_id=EOS, max_tokens_per_chunk=STREAM_TOKENS_PER_CHUNK,
        beam_size=BEAM)

    # Pre-stage device-resident chunk inputs (same methodology as the
    # headline): host-side RNG + a ~19 MB host->device transfer per chunk
    # through the remote tunnel would otherwise dominate the measurement.
    staged = [jax.device_put(_make_batch(rng, 1)) for _ in range(3)]
    jax_block(staged)

    def one_chunk(i, collect=False):
        feats, valid = encode(params, staged[i % len(staged)])
        stream.process_chunk(feats, encoder_valid=valid, collect=collect)
    # (encode includes the on-device video preprocessing via _preprocess)

    one_chunk(0, collect=True)  # compiles encode + first-chunk (priming) decode
    one_chunk(1, collect=True)  # compiles the steady-state decode variant
    t0 = time.perf_counter()
    for i in range(STREAM_CHUNKS):
        one_chunk(i)  # collect=False: chunks pipeline, no per-chunk sync
    stream.collected_tokens()  # one final drain closes the timed region
    dt = time.perf_counter() - t0

    # Long-form leg: same decoder instance (compiled fns retained), fresh
    # stream state; ~2 rollovers inside the timed region.
    stream.reset()
    t0 = time.perf_counter()
    for i in range(long_chunks):
        one_chunk(i)
    n_tokens = len(stream.collected_tokens())
    dt_long = time.perf_counter() - t0
    return (STREAM_CHUNKS * SECONDS_PER_CLIP / dt,
            long_chunks * SECONDS_PER_CLIP / dt_long, n_tokens)


def bench_train(b: int = 4, iters: int = 5, remat: bool = False,
                on_device_augment: bool = False,
                frozen_weight_quant: str | None = None,
                frozen_cast: str | None = None) -> dict:
    """Training-step throughput (opt-in via --train): joint CTC+CE step on
    the reference-parity AVNet (frozen whisper-small encoder + frozen MoCo
    ResNet-50 + trainable fusion; reference: train.py:143-170) with AdamW,
    fwd+bwd+update in one jit. Reports ms/step, clips/sec, and MFU.

    ``on_device_augment`` fuses the full stochastic augmentation chain
    (SpecAugment/babble/LN + flip/jitter/gray/time-mask/normalize) into the
    step, quantifying the device cost of ``augmentation.on_device`` mode.

    ``frozen_weight_quant="ab"``: ALSO time the step with the frozen
    Whisper-encoder kernels stored int8 (AVNet.quantize_frozen_params),
    interleaved in the same process — extra keys
    ``train_ms_per_step_int8`` / ``train_int8_loss_delta`` report the leg
    (round-3 verdict, next #6).

    ``frozen_cast="ab"``: ALSO time the step with the frozen trees (Whisper
    encoder + MoCo frontend) STORED bf16 (AVNet.cast_frozen_params — the
    non-pathological sibling of the int8 experiment: no dequantizing dot,
    just half the frozen HBM read), interleaved; extra keys
    ``train_ms_per_step_frozen_bf16`` / ``train_frozen_bf16_loss_delta``."""
    import jax
    import jax.numpy as jnp
    import optax

    from mocov2_whisper_flamingo_tpu.models import layers as L
    from mocov2_whisper_flamingo_tpu.models.av_net import AVNet
    from mocov2_whisper_flamingo_tpu.training.task import AVSRTask

    net = AVNet("audiovisual", None, 96, (512, 8, 6, 3000, 2048, 0.1), 51865,
                precision=L.BF16, remat=remat)
    params = net.init(jax.random.PRNGKey(0))
    augment_fn = None
    if on_device_augment:
        from mocov2_whisper_flamingo_tpu.config import get_config
        from mocov2_whisper_flamingo_tpu.ops.augment import make_batch_augment

        augment_fn = make_batch_augment(get_config())
    task = AVSRTask(net, augment_fn=augment_fn)
    optimizer = optax.adamw(1e-4, b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    l_tgt = 64
    batch = {
        "audio": jnp.asarray(rng.standard_normal((b, 3000, 80)), jnp.float32),
        "audio_mask": jnp.ones((b, 3000), bool),
        "video": jnp.asarray(rng.standard_normal((b, T_VIDEO, 3, 64, 64)),
                             jnp.float32),
        "video_mask": jnp.ones((b, T_VIDEO), bool),
        "video_lengths": jnp.full((b,), T_VIDEO, jnp.int32),
        "target_ids": jnp.asarray(rng.integers(1, 51000, (b, l_tgt)), jnp.int32),
        "target_lengths": jnp.full((b,), l_tgt, jnp.int32),
        "audio_lengths": jnp.full((b,), T_VIDEO, jnp.int32),
    }
    step = jax.jit(task.make_train_step(optimizer))
    key = jax.random.PRNGKey(1)
    p2, o2, losses = step(params, opt_state, batch, key)
    jax_block(losses)
    flops = None
    try:
        cost = step.lower(params, opt_state, batch, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    out_q = {}
    variant = None
    if frozen_weight_quant == "ab":
        variant = ("int8", net.quantize_frozen_params)
    elif frozen_cast == "ab":
        variant = ("frozen_bf16", net.cast_frozen_params)
    if variant is not None:
        # Same task/optimizer on the transformed-frozen-tree variant; its
        # own opt_state (the tree structure/dtypes differ on frozen leaves
        # only, which adamw still walks). Warm both, interleave the timing.
        tag, transform = variant
        params_q = transform(params)
        opt_state_q = optimizer.init(params_q)
        step_q = jax.jit(task.make_train_step(optimizer))
        pq, oq, losses_q = step_q(params_q, opt_state_q, batch, key)
        jax_block(losses_q)
        t_fp = t_q = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            p2, o2, losses = step(p2, o2, batch, key)
            jax_block(losses)
            t_fp += time.perf_counter() - t0
            t0 = time.perf_counter()
            pq, oq, losses_q = step_q(pq, oq, batch, key)
            jax_block(losses_q)
            t_q += time.perf_counter() - t0
        dt = t_fp / iters
        out_q = {
            f"train_ms_per_step_{tag}": t_q / iters * 1e3,
            f"train_{tag}_loss_delta": abs(
                float(np.asarray(losses_q["loss"]))
                - float(np.asarray(losses["loss"]))),
        }
    else:
        t0 = time.perf_counter()
        for _ in range(iters):
            p2, o2, losses = step(p2, o2, batch, key)
        jax_block(losses)
        dt = (time.perf_counter() - t0) / iters
    return {
        "train_ms_per_step": dt * 1e3,
        "train_clips_per_sec": b / dt,
        "train_mfu_pct": (flops / dt / PEAK_BF16_FLOPS * 100.0) if flops else None,
        "loss": float(np.asarray(losses["loss"])),
        **out_q,
    }


def bench_serving(n_requests: int = 64, buckets=(1, 4, 8, 16),
                  max_wait_s: float = 0.01) -> dict:
    """Online-serving throughput/latency (opt-in via --serving): closed-loop
    load through the dynamic micro-batching engine (serving/engine.py) over
    the flagship full-AV beam decode.

    Two legs, one engine:

    - **device-resident payloads** (pre-staged in HBM before the first
      compile; pad_rows collates them ON device via jnp): isolates the
      engine machinery (batcher, dispatch/completion threads, futures,
      EOS trim) from input transfer — the number a co-located pipeline
      (or any standard TPU VM with PCIe-attached chips) sees.
    - **host payloads** (per-request numpy: mel f32 + raw uint8 ROI
      frames): the full client path incl. host collate + host->device
      transfer. On this rig the axon tunnel throttles H2D to ~15-40 MB/s
      once a large executable is loaded (fresh-process transfers run at
      1.4 GB/s; see CLAUDE.md), so this leg is transfer-bound and NOT a
      TPU-hardware number — reported for honesty, interpreted in
      BASELINE.md."""
    import jax

    from mocov2_whisper_flamingo_tpu.serving import make_av_engine

    net, params = _build("whisper-small")
    rng = np.random.default_rng(0)
    payload = (
        np.asarray(rng.standard_normal((3000, 80)), np.float32),
        np.ones(3000, bool),
        rng.integers(0, 255, (T_VIDEO, 3, 88, 88)).astype(np.uint8),
        np.ones(T_VIDEO, bool),
        np.int32(T_VIDEO),
    )
    # Stage device copies BEFORE the first big compile: the tunnel's
    # post-compile H2D throttling makes later staging pathologically slow.
    dev_payloads = [jax.device_put(payload) for _ in range(4)]
    jax_block(dev_payloads)
    pct = lambda xs, q: sorted(xs)[min(len(xs) - 1, int(q * len(xs)))]
    eng = make_av_engine(net, params, PREFIX, beam_size=BEAM,
                         max_len=MAX_TOKENS, eos_id=EOS, buckets=buckets,
                         max_wait_s=max_wait_s)
    try:
        eng.warmup(dev_payloads[0])  # one XLA compile per bucket
        # Idle-load latency: sequential single host requests (B=1 bucket).
        idle_ms = []
        for _ in range(3):
            t0 = time.perf_counter()
            eng.transcribe(*payload, timeout=600)
            idle_ms.append((time.perf_counter() - t0) * 1e3)

        def saturate(reqs):
            t0 = time.perf_counter()
            futs = [eng.submit(*p) for p in reqs]
            results = [f.result(timeout=600) for f in futs]
            return len(reqs) * SECONDS_PER_CLIP / (
                time.perf_counter() - t0), results

        # Host leg FIRST: the tunnel's H2D throttling worsens with
        # accumulated transfers, so running it late understates it.
        host_rtf, results = saturate([payload] * n_requests)
        dev_rtf, _ = saturate(
            [dev_payloads[i % len(dev_payloads)] for i in range(n_requests)])

        # Per-bucket REQUEST latency (round-3 verdict, weak #9): offer
        # exactly `bucket` concurrent device-payload requests per round so
        # the batcher fills that bucket; total_ms is enqueue->result (the
        # number a client sees), queue_ms isolates the batching wait. The
        # engine batches whole utterances, so a request's latency floor is
        # one full beam decode of its bucket — no iteration-level
        # (continuous) batching; documented in BASELINE.md.
        per_bucket = {}
        for bsz in buckets:
            lat, qms = [], []
            for _ in range(3):
                reqs = [dev_payloads[i % len(dev_payloads)]
                        for i in range(bsz)]
                futs = [eng.submit(*p) for p in reqs]
                for f in futs:
                    r = f.result(timeout=600)
                    lat.append(r.total_ms)
                    qms.append(r.queue_ms)
            per_bucket[bsz] = {
                "p50_ms": round(pct(lat, 0.50), 1),
                "p99_ms": round(pct(lat, 0.99), 1),
                "queue_p50_ms": round(pct(qms, 0.50), 1),
            }
        stats = eng.stats()
    finally:
        eng.close()
    sat_ms = [r.total_ms for r in results]
    return {
        "serving_rtf_device_payloads": dev_rtf,
        "serving_rtf": host_rtf,
        "clips_per_sec": host_rtf / SECONDS_PER_CLIP,
        "idle_p50_ms": pct(idle_ms, 0.50),
        "sat_p50_ms": pct(sat_ms, 0.50),
        "sat_p99_ms": pct(sat_ms, 0.99),
        "latency_by_bucket": per_bucket,
        "bucket_counts": stats["bucket_counts"],
    }


def bench_continuous(n_requests: int = 64, capacity: int = 16) -> dict:
    """Continuous-batching engine (opt-in via --serving-continuous):
    closed-loop load through the segment-program engine
    (serving/continuous.py) over the flagship full-AV beam decode.

    Reports sustained throughput (device-resident payloads), admission
    latency (enqueue -> row admission: the metric continuous batching
    exists to bound — a request no longer waits a full bucket decode for a
    free row), per-request total latency, and a mid-load probe (one
    request submitted while the engine is saturated)."""
    import jax

    from mocov2_whisper_flamingo_tpu.serving import make_continuous_av_engine

    net, params = _build("whisper-small")
    rng = np.random.default_rng(0)
    payload = (
        np.asarray(rng.standard_normal((3000, 80)), np.float32),
        np.ones(3000, bool),
        rng.integers(0, 255, (T_VIDEO, 3, 88, 88)).astype(np.uint8),
        np.ones(T_VIDEO, bool),
        np.int32(T_VIDEO),
    )
    dev_payloads = [jax.device_put(payload) for _ in range(4)]
    jax_block(dev_payloads)
    pct = lambda xs, q: sorted(xs)[min(len(xs) - 1, int(q * len(xs)))]
    eng = make_continuous_av_engine(
        net, params, PREFIX, beam_size=BEAM, max_len=MAX_TOKENS, eos_id=EOS,
        capacity=capacity, seg_steps=32)
    try:
        eng.warmup(dev_payloads[0])
        t0 = time.perf_counter()
        futs = [eng.submit(*dev_payloads[i % len(dev_payloads)])
                for i in range(n_requests)]
        # Mid-load probe: one request into the saturated engine (waits in
        # the FIFO behind the closed-loop queue — a queue-depth number).
        probe = None
        results = []
        for i, f in enumerate(futs):
            results.append(f.result(timeout=1200))
            if probe is None and i == n_requests // 2:
                probe = eng.submit(*dev_payloads[0])
        dt = time.perf_counter() - t0
        probe_res = probe.result(timeout=1200) if probe else None
        # Mid-DECODE admission probe (the number continuous batching exists
        # for): half the rows are mid-flight, rows ARE free — a new request
        # must be admitted at the next segment boundary (~one segment),
        # not after a full bucket decode (the whole-utterance engine's
        # B=16 floor, p50 1174 ms in BASELINE.md round 4).
        warm_futs = [eng.submit(*dev_payloads[i % len(dev_payloads)])
                     for i in range(capacity // 2)]
        time.sleep(0.4)  # let them admit + decode a segment or two
        mid = eng.submit(*dev_payloads[0])
        mid_res = mid.result(timeout=1200)
        for f in warm_futs:
            f.result(timeout=1200)
        stats = eng.stats()
    finally:
        eng.close()
    admit_ms = [r.queue_ms for r in results]
    total_ms = [r.total_ms for r in results]
    out = {
        "continuous_rtf": n_requests * SECONDS_PER_CLIP / dt,
        "admission_p50_ms": pct(admit_ms, 0.50),
        "admission_p99_ms": pct(admit_ms, 0.99),
        "total_p50_ms": pct(total_ms, 0.50),
        "total_p99_ms": pct(total_ms, 0.99),
        "segments_run": stats["segments_run"],
        "capacity": capacity,
    }
    if probe_res is not None:
        out["midload_admission_ms"] = probe_res.queue_ms
        out["midload_total_ms"] = probe_res.total_ms
    out["middecode_admission_ms"] = mid_res.queue_ms
    out["middecode_total_ms"] = mid_res.total_ms
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="small",
                        help="comma list: small,medium,large-v2")
    parser.add_argument("--no-streaming", action="store_true")
    parser.add_argument("--train", action="store_true",
                        help="bench the training step instead of decode")
    parser.add_argument("--train-batch", type=int, default=4,
                        help="batch size for --train (MFU scales with B)")
    parser.add_argument("--train-remat", action="store_true",
                        help="rematerialize the fusion blocks in --train "
                             "(the Trainer's config default)")
    parser.add_argument("--train-augment", action="store_true",
                        help="fuse the on-device augmentation chain into "
                             "the --train step (augmentation.on_device)")
    parser.add_argument("--train-frozen-quant", default=None,
                        choices=(None, "ab"),
                        help="'ab': interleave an int8-frozen-encoder leg "
                             "into --train (w8a16 on the frozen whisper "
                             "kernels)")
    parser.add_argument("--train-frozen-cast", default=None,
                        choices=(None, "ab"),
                        help="'ab': interleave a bf16-stored-frozen-trees "
                             "leg into --train (halves the frozen HBM read "
                             "with no dequantizing dot)")
    parser.add_argument("--serving", action="store_true",
                        help="bench the online serving engine (closed-loop "
                             "load, throughput + latency percentiles)")
    parser.add_argument("--serving-continuous", action="store_true",
                        help="bench the continuous-batching engine "
                             "(segment-bounded admission, early-exit row "
                             "reuse)")
    parser.add_argument("--wide-buckets", action="store_true",
                        help="bench the north-star serving composition "
                             "(batch-aware windowed ladder + w8a16 weights "
                             "+ batch-appropriate cache layout) at "
                             "whisper-medium B=8 and large-v2 B=4/8")
    parser.add_argument("--b16-quant", default=None,
                        choices=(None, "int8", "int8-cross"),
                        help="KV-cache quantization for the B=16 serving leg")
    parser.add_argument("--weight-quant", default=None,
                        choices=(None, "int8", "ab"),
                        help="weight-only int8 decode step for the per-size "
                             "runs (the HBM lever at medium/large sizes); "
                             "'ab' times bf16 AND int8 in one process for a "
                             "variance-free comparison")
    parser.add_argument("--init-timeout", type=float, default=180.0,
                        help="seconds to wait for TPU device init before "
                             "emitting a diagnostic JSON line and exiting "
                             "(the axon tunnel can wedge for hours — "
                             "CLAUDE.md; 0 disables)")
    args = parser.parse_args()

    if args.init_timeout > 0:
        # Device init through the axon tunnel can hang indefinitely when
        # the remote worker is wedged; surface that as a diagnostic line
        # instead of an opaque driver timeout. The probe runs in a daemon
        # thread so a hung PJRT init cannot block the watchdog.
        import threading

        ready = threading.Event()

        def _probe():
            import jax  # noqa: F811

            jax.devices()
            ready.set()

        threading.Thread(target=_probe, daemon=True).start()
        if not ready.wait(args.init_timeout):
            print(json.dumps({
                "metric": "AVSR full-AV decode realtime factor (beam=5)",
                "value": None, "unit": "x_realtime", "vs_baseline": None,
                "error": f"TPU device init did not complete within "
                         f"{args.init_timeout:.0f}s (tunnel wedged)",
            }))
            import os as _os

            _os._exit(3)  # the hung init thread cannot be joined

    if args.serving_continuous:
        r = bench_continuous()
        print(json.dumps({
            "metric": "continuous-batching sustained throughput "
                      "(full-AV beam=5, segment-bounded admission)",
            "value": round(r["continuous_rtf"], 2),
            "unit": "x realtime",
            **{k: (round(v, 1) if isinstance(v, float) else v)
               for k, v in r.items() if k != "continuous_rtf"},
        }))
        return
    if args.serving:
        r = bench_serving()
        print(json.dumps({
            "metric": "online serving sustained throughput "
                      "(full-AV beam=5, dynamic batching)",
            "value": round(r["serving_rtf_device_payloads"], 2),
            "unit": "x realtime",
            "host_payload_rtf": round(r["serving_rtf"], 2),
            "clips_per_sec": round(r["clips_per_sec"], 2),
            "idle_p50_ms": round(r["idle_p50_ms"], 1),
            "sat_p50_ms": round(r["sat_p50_ms"], 1),
            "sat_p99_ms": round(r["sat_p99_ms"], 1),
            "latency_by_bucket": r["latency_by_bucket"],
            "bucket_counts": r["bucket_counts"],
        }))
        return
    if args.train:
        r = bench_train(b=args.train_batch, remat=args.train_remat,
                        on_device_augment=args.train_augment,
                        frozen_weight_quant=args.train_frozen_quant,
                        frozen_cast=args.train_frozen_cast)
        print(json.dumps({
            "metric": f"AVNet joint CTC+CE train step "
                      f"(B={args.train_batch}, fwd+bwd+AdamW"
                      f"{'+augment' if args.train_augment else ''})",
            "value": round(r["train_ms_per_step"], 2),
            "unit": "ms/step",
            "clips_per_sec": round(r["train_clips_per_sec"], 2),
            "mfu_pct": r["train_mfu_pct"] and round(r["train_mfu_pct"], 2),
            **({"ms_per_step_frozen_int8": round(r["train_ms_per_step_int8"], 2),
                "frozen_int8_loss_delta": round(r["train_int8_loss_delta"], 5)}
               if "train_ms_per_step_int8" in r else {}),
            **({"ms_per_step_frozen_bf16":
                    round(r["train_ms_per_step_frozen_bf16"], 2),
                "frozen_bf16_loss_delta":
                    round(r["train_frozen_bf16_loss_delta"], 5)}
               if "train_ms_per_step_frozen_bf16" in r else {}),
        }))
        return
    if args.wide_buckets:
        # North-star serving composition (round-4 verdict, weak #6): the
        # realistic wide-bucket configuration at medium/large-v2 — windows
        # + w8a16 weight-only decode + the batch-appropriate cache layout
        # (rows below B=16 per the round-5 layout A/B). One process,
        # sequential sizes; per-leg rtf + ms/step recorded for BASELINE.
        from mocov2_whisper_flamingo_tpu.decode.beam import (
            default_read_windows)

        import gc

        legs = []
        for size, wb in (("medium", 8), ("large-v2", 4), ("large-v2", 8)):
            r = bench_size(
                f"whisper-{size}", b=wb, iters=3, weight_quant="int8",
                read_windows=default_read_windows(MAX_TOKENS, batch=wb),
                cache_layout="bhjtd" if wb >= 16 else "rows")
            leg = {"size": size, "batch": wb,
                   "rtf": round(r["rtf"], 1),
                   "decode_ms_per_step": round(r["decode_ms_per_step"], 3),
                   "encode_ms": round(r["encode_ms"], 1)}
            legs.append(leg)
            # Drop the leg's params/net (large-v2 fp32 masters are ~6 GB of
            # HBM) and its compiled programs before the next leg builds its
            # own — keeping the previous result dict alive OOM'd large-v2
            # B=8 on the 16 GB chip.
            r.clear()
            del r
            import jax as _jax

            _jax.clear_caches()
            gc.collect()
            print(f"[bench] wide-bucket {size} B={wb} (w8a16+windows): "
                  f"rtf={leg['rtf']}x decode={leg['decode_ms_per_step']}"
                  f"ms/step encode={leg['encode_ms']}ms", file=sys.stderr)
        print(json.dumps({
            "metric": "wide-bucket north-star serving composition "
                      "(full-AV beam=5, w8a16 + windowed ladder)",
            "value": legs[-1]["rtf"],
            "unit": "x realtime (large-v2 B=8)",
            "legs": legs,
        }))
        return

    sizes = [s.strip() for s in args.sizes.split(",") if s.strip()]

    from mocov2_whisper_flamingo_tpu.decode.beam import default_read_windows

    result = None
    for size in sizes:
        name = f"whisper-{size}"
        b = B if size in ("small", "base", "tiny") else 2
        # Batch-aware windowed ladder on the headline leg (round-5 A/B:
        # thirds ladder at B=4 1.277 -> 1.233 ms/step, tokens exact;
        # medium B=2 measured -2% in round 4).
        r = bench_size(name, b=b, iters=5 if size == "small" else 3,
                       weight_quant=args.weight_quant,
                       read_windows=default_read_windows(MAX_TOKENS, batch=b))
        quant_tag = ' (int8 weights)' if args.weight_quant == 'int8' else ''
        print(f"[bench] {name} B={b}{quant_tag}: "
              f"rtf={r['rtf']:.1f}x "
              f"encode={r['encode_ms']:.1f}ms "
              f"decode={r['decode_ms_per_step']:.2f}ms/step "
              f"mfu={r['mfu_pct'] and round(r['mfu_pct'], 1)}%",
              file=sys.stderr)
        if "int8_error" in r:
            print(f"[bench] {name} B={b} int8 leg failed (bf16 stands): "
                  f"{r['int8_error']}", file=sys.stderr)
        if "rtf_int8" in r:
            print(f"[bench] {name} B={b} int8 weights (interleaved A/B): "
                  f"rtf={r['rtf_int8']:.1f}x "
                  f"(bf16 interleaved {r['rtf_bf16_interleaved']:.1f}x) "
                  f"decode={r['decode_ms_per_step_int8']:.2f}ms/step "
                  f"tokens_match={r['int8_tokens_match']}",
                  file=sys.stderr)
        if size == "small":
            result = r

    if result is None:  # non-default sizes only: report the first measured
        name = f"whisper-{sizes[0]}"
        result = r  # noqa: F821

    throughput = None
    if "small" in sizes:
        # Serving-throughput bucket: at B=4 the decode step is op-count-
        # bound (~640 small kernels/step, tools/profile_decode.py); at B=16
        # cache traffic makes it bandwidth-bound (10.45 ms/step measured),
        # so the wide bucket buys only a modest rtf gain — reported so the
        # serving-throughput curve is on record.
        try:
            # bhjtd cache layout at the wide bucket: the round-5 on-chip A/B
            # (tools/cache_layout_ab.py) measured 6.25 -> 5.34 ms/step over
            # rows with the same fifths ladder (10.24 -> 7.52 unwindowed),
            # tokens exact; rows stays the winner at B=4/8 (1.49 vs 1.58,
            # 1.63 vs 2.64), so the layout flips at B>=16 only.
            r16 = bench_size("whisper-small", b=16, iters=3,
                             cache_quant=args.b16_quant,
                             read_windows=default_read_windows(MAX_TOKENS,
                                                               batch=16),
                             cache_layout="bhjtd")
            throughput = r16["rtf"]
            print(f"[bench] whisper-small B=16 serving bucket"
                  f"{' (int8 KV)' if args.b16_quant else ''}"
                  f" (windowed-prefix scan, bhjtd cache): "
                  f"rtf={throughput:.1f}x "
                  f"decode={r16['decode_ms_per_step']:.2f}ms/step",
                  file=sys.stderr)
        except Exception as e:
            print(f"[bench] B=16 bucket failed: {e!r}", file=sys.stderr)

    streaming_rtf = longform_rtf = None
    if not args.no_streaming:
        try:
            streaming_rtf, longform_rtf, longform_tokens = bench_streaming(
                result["net"], result["params"],
                weight_quant="int8" if args.weight_quant == "int8" else None)
            print(f"[bench] streaming (5 min AV, beam={BEAM}): "
                  f"{streaming_rtf:.1f}x realtime", file=sys.stderr)
            print(f"[bench] long-form (10 min AV, beam={BEAM}, ~2 window "
                  f"rollovers, {longform_tokens} tokens): "
                  f"{longform_rtf:.1f}x realtime", file=sys.stderr)
        except Exception as e:  # keep the headline line intact
            print(f"[bench] streaming failed: {e!r}", file=sys.stderr)

    line = {
        "metric": "AVSR beam=5 decode real-time factor (audio-sec/sec/chip)",
        "value": round(result["rtf"], 2),
        "unit": "x realtime",
        "vs_baseline": round(result["rtf"] / 50.0, 3),
        "encode_ms_per_batch": round(result["encode_ms"], 2),
        "decode_ms_per_step": round(result["decode_ms_per_step"], 3),
        "decode_mfu_pct": result["mfu_pct"] and round(result["mfu_pct"], 2),
        "streaming_rtf": streaming_rtf and round(streaming_rtf, 2),
        "longform_rtf": longform_rtf and round(longform_rtf, 2),
        "throughput_b16_rtf": throughput and round(throughput, 2),
    }
    # Tag quantized runs so recorded headlines never conflate quantized and
    # bf16 numbers, and carry the A/B keys into the machine-readable line.
    if args.weight_quant:
        line["weight_quant"] = args.weight_quant
    if args.b16_quant:
        line["b16_cache_quant"] = args.b16_quant
    for k in ("rtf_int8", "decode_ms_per_step_int8", "int8_tokens_match",
              "rtf_bf16_interleaved", "decode_ms_per_step_bf16_interleaved",
              "int8_error"):
        if k in result:
            v = result[k]
            line[k] = round(v, 3) if isinstance(v, float) else v
    print(json.dumps(line))


if __name__ == "__main__":
    main()
