"""Audio-only Whisper ASR pipeline (BASELINE configs 1-2).

wav -> fused log-mel (ops.mel, HF-parity) -> Whisper encoder -> KV-cached
greedy/beam decode -> token ids -> tokenizer text. The audio-only capability
the reference exercises implicitly by zeroing the video stream
(reference: verify_model.py modal "AO"; config data.modality "audio").
Supports optional babble-noise SNR mixing on the mel (quirk Q1 semantics)
via ``ops.augment.add_babble_noise``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mocov2_whisper_flamingo_tpu.decode.beam import BeamResult, beam_search
from mocov2_whisper_flamingo_tpu.decode.greedy import greedy_decode
from mocov2_whisper_flamingo_tpu.models import layers as L
from mocov2_whisper_flamingo_tpu.models.whisper import (
    WhisperConfig, WhisperDecoder, WhisperEncoder, config_for)
from mocov2_whisper_flamingo_tpu.ops.mel import whisper_log_mel


class WhisperASR:
    """Encoder-decoder ASR with an end-to-end ``transcribe_tokens``."""

    def __init__(self, whisper_name: str = "whisper-base",
                 precision: L.Precision = L.FP32, backend: str | None = None,
                 config: WhisperConfig | None = None):
        if backend is None:
            from mocov2_whisper_flamingo_tpu.ops.attention import default_attention_backend

            backend = default_attention_backend()
        self.config = config or config_for(whisper_name)
        self.encoder = WhisperEncoder(self.config, precision, backend)
        self.decoder = WhisperDecoder(self.config, precision, backend)
        self.precision = precision

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        return {"encoder": self.encoder.init(k1), "decoder": self.decoder.init(k2)}

    def load_whisper_torch(self, state_dict) -> dict:
        from mocov2_whisper_flamingo_tpu.models.convert import (
            whisper_decoder_from_torch, whisper_encoder_from_torch)

        return {
            "encoder": jax.tree.map(jnp.asarray, whisper_encoder_from_torch(
                state_dict, self.config.encoder_layers)),
            "decoder": jax.tree.map(jnp.asarray, whisper_decoder_from_torch(
                state_dict, self.config.decoder_layers)),
        }

    def features(self, audio: jnp.ndarray, pad_to: int | None = 480_000) -> jnp.ndarray:
        """wav [T] or [B, T] -> log-mel [B, 80, frames]."""
        mel = whisper_log_mel(audio, pad_to=pad_to)
        if mel.ndim == 2:
            mel = mel[None]
        return mel

    def encode(self, params: dict, mel: jnp.ndarray) -> jnp.ndarray:
        return self.encoder.apply(params["encoder"], mel)

    def transcribe_tokens(
        self,
        params: dict,
        audio: jnp.ndarray,
        prefix_ids: Sequence[int],
        beam_size: int = 1,
        max_len: int = 224,
        eos_id: int = 50257,
        pad_to: int | None = 480_000,
        logit_rules=None,
        weight_quant: str | None = None,
    ) -> jnp.ndarray:
        """wav -> token ids [B, max_len] (best beam when beam_size > 1).
        ``logit_rules``: optional ``decode.LogitRules`` with the HF-default
        Whisper suppress/forced/timestamp semantics. ``weight_quant="int8"``:
        weight-only int8 decode step."""
        mel = self.features(audio, pad_to=pad_to)
        enc = self.encode(params, mel)
        # Decoder params cast to the compute dtype ONCE (not per token step).
        dec_params = self._cast_decoder_params(params, weight_quant)
        if beam_size <= 1:
            return greedy_decode(self.decoder, dec_params, enc,
                                 prefix_ids, max_len, eos_id,
                                 logit_rules=logit_rules)
        from mocov2_whisper_flamingo_tpu.decode.beam import (
            default_read_windows)

        res: BeamResult = beam_search(self.decoder, dec_params, enc,
                                      prefix_ids, beam_size=beam_size,
                                      max_len=max_len, eos_id=eos_id,
                                      logit_rules=logit_rules,
                                      read_windows=default_read_windows(
                                          max_len, batch=enc.shape[0]))
        return res.sequences[:, 0]

    def detect_language(
        self,
        params: dict,
        audio: jnp.ndarray,
        sot_id: int,
        language_token_ids: Sequence[int],
        pad_to: int | None = 480_000,
        dec_params: dict | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Spoken-language ID from the first 30 s (openai
        ``model.detect_language``): returns ([B] best language token id,
        [B, n_lang] probabilities ordered as ``language_token_ids``).
        ``dec_params``: already-cast decoder params to reuse (skips a
        second full-tree cast/HBM copy when the caller holds one)."""
        from mocov2_whisper_flamingo_tpu.decode.language import detect_language

        enc = self.encode(params, self.features(audio, pad_to=pad_to))
        if dec_params is None:
            dec_params = self._cast_decoder_params(params)
        return detect_language(self.decoder, dec_params,
                               enc, sot_id, language_token_ids)

    def _cast_decoder_params(self, params: dict,
                             weight_quant: str | None = None) -> dict:
        if weight_quant is not None:
            # int8 weight-only decode (fuses QKV as a prerequisite — the
            # fused kernel is what gets quantized); see
            # WhisperDecoder.prepare_decode_params.
            return self.decoder.prepare_decode_params(params["decoder"],
                                                      weight_quant)
        prec = self.precision
        return jax.tree.map(
            lambda x: prec.cast(x) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params["decoder"])

    @property
    def _encode_jit(self):
        """Cached jitted encoder forward (one compile per mel shape per
        model instance — eager apply costs hundreds of per-op dispatches
        through a remote-TPU tunnel)."""
        fn = self.__dict__.get("_encode_jit_fn")
        if fn is None:
            fn = jax.jit(self.encoder.apply)
            self.__dict__["_encode_jit_fn"] = fn
        return fn

    @property
    def _align_jit(self):
        """Cached jitted teacher-forced decoder forward returning the
        cross-attention stack (word-time alignment)."""
        fn = self.__dict__.get("_align_jit_fn")
        if fn is None:
            fn = jax.jit(lambda p, t, e: self.decoder.apply(
                p, t, e, return_cross_weights=True))
            self.__dict__["_align_jit_fn"] = fn
        return fn

    def transcribe(
        self,
        params: dict,
        audio: jnp.ndarray,
        prefix_ids: Sequence[int],
        tokenizer=None,
        beam_size: int = 5,
        max_len: int = 448,
        eos_id: int = 50257,
        chunk_seconds: float = 30.0,
        sample_rate: int = 16_000,
        max_tokens_per_chunk: int = 64,
        temperatures: Sequence[float] | None = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        best_of: int = 5,
        length_penalty: float = 1.0,
        logprob_threshold: float | None = -1.0,
        compression_ratio_threshold: float | None = 2.4,
        no_speech_threshold: float | None = None,
        no_speech_id: int | None = None,
        sot_id: int | None = None,
        condition_on_previous_text: bool = True,
        context_tokens: int = 128,
        sot_prev_id: int | None = None,
        initial_prompt: str | None = None,
        initial_prompt_ids: Sequence[int] | None = None,
        detect_language_ids: Sequence[int] | None = None,
        language_slot: int = 1,
        logit_rules=None,
        word_times: bool = False,
        group_fn=None,
        alignment_heads: Sequence[tuple[int, int]] | None = None,
        key: jax.Array | None = None,
        weight_quant: str | None = None,
    ) -> dict:
        """Long-form transcription of arbitrary-length audio — the
        user-facing equivalent of openai ``whisper.transcribe`` / HF
        ``pipeline("automatic-speech-recognition")``.

        ``temperatures`` given (default): openai's robust window loop —
        per 30 s window ``decode.sampling.decode_with_fallback`` with the
        compression-ratio / avg-logprob gates, optional no-speech skip
        (``no_speech_threshold`` + ``no_speech_id``), and
        ``condition_on_previous_text`` context prompts. ``None``: the
        fully-compiled streaming path (decode/streaming.py — persistent
        cache, one dispatch per chunk, maximum throughput).

        Returns ``{"tokens": [...], "text": str|None, "segments": [...],
        "words": [...]|None}``; ``text`` (full and per-segment) when a
        ``tokenizer`` (``.decode(ids) -> str``) is given, ``segments`` are
        per-30 s-window dicts (quality mode adds temperature/avg_logprob/
        no_speech_prob diagnostics — openai's result shape, consumable by
        ``utils.writers.get_writer`` for txt/srt/vtt/tsv/json output),
        ``words`` (``decode.timestamps.WordTiming``) when ``word_times``
        with a ``group_fn`` — word times are per-window DTW alignments
        offset by each window's start (openai semantics).
        """
        from mocov2_whisper_flamingo_tpu.decode.streaming import (
            transcribe_long_form)

        # weight_quant="int8": the quantized tree serves every consumer
        # below — decode_step paths read int8, and the word-time alignment
        # forward (decoder.apply) dequantizes the shared weights in-graph.
        dec_params = self._cast_decoder_params(params, weight_quant)
        text_fn = (lambda ids: tokenizer.decode(ids)) if tokenizer else None
        prefix_ids = [int(t) for t in prefix_ids]
        language = language_probs = None
        if detect_language_ids is not None:
            # openai transcribe(language=None): detect on the first 30 s
            # and substitute the language token into the decode prefix.
            audio_arr = jnp.asarray(audio)
            first = audio_arr[..., : int(chunk_seconds * sample_rate)]
            best, probs = self.detect_language(
                params, first, prefix_ids[0], list(detect_language_ids),
                pad_to=int(chunk_seconds * sample_rate),
                dec_params=dec_params)
            language = int(np.asarray(best)[0])
            language_probs = {int(t): float(p) for t, p in
                              zip(detect_language_ids,
                                  np.asarray(probs)[0])}
            prefix_ids[language_slot] = language
        if initial_prompt is not None:
            if initial_prompt_ids is not None:
                raise ValueError(
                    "pass initial_prompt OR initial_prompt_ids, not both")
            if tokenizer is None:
                raise ValueError("initial_prompt (text) needs a tokenizer")
            initial_prompt_ids = tokenizer.encode(
                " " + initial_prompt.strip(), add_special_tokens=False)
        tokens, segments = transcribe_long_form(
            self.encoder, self.decoder, params["encoder"], dec_params,
            audio, prefix_ids, eos_id=eos_id, chunk_seconds=chunk_seconds,
            sample_rate=sample_rate, max_len=max_len,
            max_tokens_per_chunk=max_tokens_per_chunk, beam_size=beam_size,
            length_penalty=length_penalty, logit_rules=logit_rules,
            context_tokens=context_tokens if condition_on_previous_text else 0,
            sot_prev_id=sot_prev_id, initial_prompt_ids=initial_prompt_ids,
            temperatures=temperatures,
            best_of=best_of, logprob_threshold=logprob_threshold,
            compression_ratio_threshold=compression_ratio_threshold,
            no_speech_threshold=no_speech_threshold,
            no_speech_id=no_speech_id, sot_id=sot_id, text_fn=text_fn,
            key=key, return_segments=True)
        if text_fn:
            for seg in segments:
                seg["text"] = text_fn(seg["tokens"])
        out = {"tokens": tokens,
               "text": text_fn(tokens) if text_fn else None,
               "segments": segments, "words": None,
               "language": language, "language_probs": language_probs}
        if word_times:
            if group_fn is None:
                raise ValueError("word_times needs a tokenizer-aware group_fn")
            out["words"] = self._word_times(
                params, dec_params, audio, segments, list(prefix_ids),
                group_fn, chunk_seconds=chunk_seconds,
                sample_rate=sample_rate, eos_id=eos_id,
                alignment_heads=alignment_heads,
                timestamp_begin=getattr(logit_rules, "timestamp_begin", None)
                if logit_rules is not None else None)
        return out

    def _word_times(self, params, dec_params, audio, segments, prefix,
                    group_fn, chunk_seconds, sample_rate, eos_id,
                    alignment_heads=None, timestamp_begin=None):
        """Per-window DTW word alignment: each segment's tokens are
        re-scored teacher-forced against that window's encoder output (one
        compiled forward per window) and times are offset by the window
        start. Segment boundaries give exact token->window attribution."""
        from mocov2_whisper_flamingo_tpu.decode.timestamps import (
            word_timestamps)

        audio = jnp.asarray(audio)
        chunk_samples = int(chunk_seconds * sample_rate)
        # One alignment per decode WINDOW (openai add_word_timestamps
        # aligns all of a window's text at once): group segments by their
        # seek origin and concatenate their text tokens.
        windows: dict[float, list[int]] = {}
        for seg in segments:
            toks = seg["tokens"]
            if timestamp_begin is not None:
                toks = [t for t in toks if t < timestamp_begin]
            # fallback for caller-supplied segments without a seek key:
            # the window ORIGIN is the floor multiple (round() would map a
            # segment starting in a window's second half to the NEXT window)
            start_s = seg.get(
                "seek", int(seg["start"] // chunk_seconds) * chunk_seconds)
            windows.setdefault(start_s, []).extend(toks)
        words = []
        max_pos = self.config.max_target_positions
        for start_s, window in windows.items():
            if not window:
                continue
            s0 = int(round(start_s * sample_rate))
            chunk = audio[..., s0:s0 + chunk_samples]
            mel = self.features(chunk, pad_to=chunk_samples)
            enc = self._encode_jit(params["encoder"], mel)
            n_frames = min(max(chunk.shape[-1] // 320, 1), enc.shape[1])
            seq = prefix + window + [eos_id]
            if len(seq) > max_pos:
                # A budget-filling window leaves no room for the appended
                # EOS row in the decoder's learned-PE table; trailing rows
                # are excluded from the DTW path anyway (n_drop_last).
                seq = seq[:max_pos]
            n_text = min(len(window), len(seq) - len(prefix))
            # Bucket the teacher-forced length to powers of two so XLA
            # compiles one alignment program per bucket, not one per
            # distinct window length (pads are cropped pre-statistics
            # inside token_timestamps — bit-identical results).
            pad_len = min(max_pos, 1 << max(5, (len(seq) - 1).bit_length()))
            ws = word_timestamps(self.decoder, dec_params, seq, enc,
                                 group_fn, n_prefix=len(prefix),
                                 n_text=n_text, n_frames=n_frames,
                                 alignment_heads=alignment_heads,
                                 apply_fn=self._align_jit,
                                 pad_tokens_to=pad_len, pad_id=eos_id)
            off = start_s
            for w in ws:
                w.start += off
                w.end += off
            words.extend(ws)
        return words
