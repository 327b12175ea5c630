"""Transcribe audio files from the command line — the openai ``whisper``
CLI capability (openai whisper/transcribe.py ``cli``), which the reference
exposes only implicitly through HF weights (reference: models/av_net.py:22).

    python -m mocov2_whisper_flamingo_tpu.tools.transcribe audio.wav \
        --model whisper-base --checkpoint ckpt/ --tokenizer TW_tokenizer \
        --output-format srt --output-dir out/

Audio input: ``.wav`` (native C++ loader + Kaiser resample to 16 kHz) or
``.npy`` (pre-decoded float waveform; assumed 16 kHz). Weights: an orbax
checkpoint produced by ``tools/convert_checkpoint.py`` / training (a bare
``{"encoder","decoder"}`` tree or a nested ``{"params": ...}``), or — with
``--random-init`` — fresh random weights (pipeline smoke; this offline image
has no pretrained weights). Decoding runs the full quality window loop
(temperature fallback + gates) unless ``--streaming`` selects the compiled
persistent-cache path; ``--word-timestamps`` adds DTW word times (whitespace
grouping on the decoded text).
"""

from __future__ import annotations

import argparse
import os
import sys


def load_audio(path: str, sample_rate: int = 16_000):
    import numpy as np

    if path.endswith(".npy"):
        wav = np.load(path).astype(np.float32).reshape(-1)
        return wav
    from mocov2_whisper_flamingo_tpu.datamodule import native

    wav, sr = native.read_wav_mono(path)
    if sr != sample_rate:
        wav = native.resample(wav, sr, sample_rate)
    return wav.astype("float32")


def default_group_fn(tokenizer):
    """openai word grouping (whisper/tokenizer.py ``split_tokens_on_spaces``):
    unicode-safe subword split (a multi-byte character split across byte-BPE
    tokens — every accented Vietnamese letter — stays one piece instead of
    decoding to U+FFFD), then new words at leading spaces / punctuation
    pieces. Words keep their leading space; display writers strip it."""
    from mocov2_whisper_flamingo_tpu.decode.timestamps import (
        split_tokens_on_spaces)

    def group(token_ids):
        return [(word, len(toks))
                for word, toks in split_tokens_on_spaces(tokenizer, token_ids)]

    return group


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("audio", nargs="+", help=".wav or .npy file(s)")
    parser.add_argument("--model", default="whisper-base")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint dir with encoder/decoder params")
    parser.add_argument("--random-init", action="store_true",
                        help="random weights (smoke runs; no checkpoint)")
    parser.add_argument("--tokenizer", default=None,
                        help="tokenizer dir (utils.load_tokenizer); default "
                             "byte-fallback tokenizer")
    parser.add_argument("--language", default="vietnamese")
    parser.add_argument("--task", default="transcribe",
                        choices=("transcribe", "translate"))
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--streaming", action="store_true",
                        help="compiled persistent-cache path instead of the "
                             "quality window loop")
    parser.add_argument("--temperature", type=float, nargs="+",
                        default=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0))
    parser.add_argument("--word-timestamps", action="store_true")
    parser.add_argument("--initial-prompt", default=None,
                        help="conditioning text for the first window "
                             "(openai --initial_prompt)")
    parser.add_argument("--highlight-words", action="store_true",
                        help="srt/vtt: one cue per word with the active "
                             "word underlined (needs --word-timestamps)")
    parser.add_argument("--max-words-per-line", type=int, default=None,
                        help="srt/vtt: at most N words per cue (needs "
                             "--word-timestamps)")
    parser.add_argument(
        "--generation-config", default=None,
        help="path to an HF generation_config.json: applies its suppress/"
             "begin-suppress/forced token rules during decoding")
    parser.add_argument(
        "--timestamps", action="store_true",
        help="enable the Whisper timestamp grammar (requires "
             "--generation-config): segments split at predicted timestamp "
             "pairs and windows seek to the last timestamp (openai loop)")
    parser.add_argument("--output-format", default="txt",
                        choices=("txt", "srt", "vtt", "tsv", "json", "all"))
    parser.add_argument("--output-dir", default=".")
    parser.add_argument("--max-len", type=int, default=448)
    parser.add_argument("--chunk-seconds", type=float, default=30.0)
    args = parser.parse_args(argv)

    if not args.checkpoint and not args.random_init:
        parser.error("need --checkpoint (or --random-init for smoke runs)")

    import jax

    from mocov2_whisper_flamingo_tpu.models.asr import WhisperASR
    from mocov2_whisper_flamingo_tpu.utils.tokenizer import load_tokenizer
    from mocov2_whisper_flamingo_tpu.utils.writers import (
        WRITER_FORMATS, get_writer)

    tokenizer = load_tokenizer(args.tokenizer, language=args.language,
                               task=args.task)
    model = WhisperASR(args.model)
    if args.checkpoint:
        from mocov2_whisper_flamingo_tpu.tools.evaluate import restore_params

        params = restore_params(
            args.checkpoint, model.init(jax.random.PRNGKey(0)))
    else:
        params = model.init(jax.random.PRNGKey(0))

    prefix = list(tokenizer.prefix_token_ids)
    eos = int(tokenizer.eos_token_id)
    logit_rules = None
    if args.generation_config:
        import json as _json

        from mocov2_whisper_flamingo_tpu.decode import LogitRules

        with open(args.generation_config, encoding="utf-8") as f:
            logit_rules = LogitRules.for_whisper(
                _json.load(f), model.config.vocab_size,
                timestamps=args.timestamps)
    elif args.timestamps:
        parser.error("--timestamps requires --generation-config")
    formats = WRITER_FORMATS if args.output_format == "all" \
        else (args.output_format,)
    os.makedirs(args.output_dir, exist_ok=True)

    for path in args.audio:
        wav = load_audio(path)
        result = model.transcribe(
            params, wav, prefix, tokenizer=tokenizer,
            beam_size=args.beam_size, max_len=args.max_len, eos_id=eos,
            chunk_seconds=args.chunk_seconds,
            temperatures=None if args.streaming else tuple(args.temperature),
            logit_rules=logit_rules,
            initial_prompt=args.initial_prompt,
            word_times=args.word_timestamps,
            group_fn=default_group_fn(tokenizer)
            if args.word_timestamps else None)
        if result["text"] is None:
            result["text"] = tokenizer.decode(result["tokens"])
            for seg in result["segments"]:
                seg["text"] = tokenizer.decode(seg["tokens"])
        base = os.path.join(
            args.output_dir, os.path.splitext(os.path.basename(path))[0])
        for fmt in formats:
            out_path = f"{base}.{fmt}"
            kw = {}
            if fmt in ("srt", "vtt"):
                if args.highlight_words:
                    kw["highlight_words"] = True
                if args.max_words_per_line:
                    kw["max_words_per_line"] = args.max_words_per_line
            with open(out_path, "w", encoding="utf-8") as fh:
                get_writer(fmt)(result, fh, **kw)
            print(f"wrote {out_path}", file=sys.stderr)
        print(result["text"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
