"""Long-form transcription demo — the full user journey on one file.

Generates a synthetic wav, builds a (random-init) WhisperASR, and runs the
openai-`transcribe`-shaped pipeline end to end: quality window loop with
temperature fallback, language auto-detection, word timestamps via
cross-attention DTW (native C++ DP), and srt/vtt/json transcript writers.
With real converted HF weights (`WhisperASR.load_whisper_torch`) the same
script produces real transcripts; offline it demonstrates the plumbing.

    python examples/transcribe_demo.py [--outdir /tmp/transcribe_demo]

Runs on whatever backend jax selects (TPU on the chip, CPU elsewhere);
uses whisper-tiny shapes so CPU finishes in ~1 min.
"""

from __future__ import annotations

import argparse
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", default="/tmp/transcribe_demo")
    parser.add_argument("--seconds", type=float, default=4.0)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from mocov2_whisper_flamingo_tpu.models.asr import WhisperASR
    from mocov2_whisper_flamingo_tpu.utils.tokenizer import load_tokenizer
    from mocov2_whisper_flamingo_tpu.utils.writers import get_writer
    from mocov2_whisper_flamingo_tpu.tools.transcribe import default_group_fn

    os.makedirs(args.outdir, exist_ok=True)

    # 1. synthesize audio (a chirp with pauses) and write a real wav
    sr = 16_000
    t = np.arange(int(args.seconds * sr)) / sr
    wav_f = (0.3 * np.sin(2 * np.pi * (220 + 60 * t) * t)
             * (np.sin(2 * np.pi * 0.5 * t) > -0.3)).astype(np.float32)
    wav_path = os.path.join(args.outdir, "demo.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((wav_f * 32767).astype("<i2").tobytes())
    print(f"[1] wrote {wav_path} ({args.seconds:.1f}s)")

    # 2. model + tokenizer (random weights offline; swap in
    #    load_whisper_torch(state_dict) for real transcripts)
    tokenizer = load_tokenizer(None)
    model = WhisperASR("whisper-tiny", backend="xla")
    params = model.init(jax.random.PRNGKey(0))
    print("[2] whisper-tiny initialized "
          f"({sum(x.size for x in jax.tree.leaves(params)):,} params)")

    # 3. transcribe: quality loop + language detection + word times
    prefix = list(tokenizer.prefix_token_ids)
    out = model.transcribe(
        params, wav_f, prefix, tokenizer=tokenizer, beam_size=2,
        best_of=2, max_len=16, eos_id=tokenizer.eos_token_id,
        chunk_seconds=2.0, temperatures=(0.0, 0.5),
        logprob_threshold=None, compression_ratio_threshold=2.4,
        detect_language_ids=[2],  # ByteTokenizer <|vi|>
        word_times=True, group_fn=default_group_fn(tokenizer))
    print(f"[3] transcribed: {len(out['tokens'])} tokens, "
          f"{len(out['segments'])} segments, "
          f"{len(out['words'] or [])} words, language token "
          f"{out['language']}")

    # 4. write every transcript format
    for fmt in ("txt", "srt", "vtt", "json"):
        path = os.path.join(args.outdir, f"demo.{fmt}")
        with open(path, "w", encoding="utf-8") as fh:
            get_writer(fmt)(out, fh)
        print(f"[4] wrote {path}")
    print("done")


if __name__ == "__main__":
    main()
