"""Long-form streaming decode: 30 s chunks with a persistent KV cache.

North-star config 5 (BASELINE.md): the reference bounds sequence length
instead of streaming (SURVEY.md §5.7 — 12 s segments, hard caps at 3000 mel
frames / 400 video frames). Here long audio is processed as consecutive 30 s
chunks through the encoder while the *decoder state persists*: generated
tokens stay in the self-attention KV cache across chunks and each chunk swaps
in fresh cross-attention K/V — so the transcript continues seamlessly without
re-decoding, and per-chunk work is one encoder pass + incremental decode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class StreamingDecoder:
    """Feed chunks of encoder features; carries transcript + decoder cache."""

    def __init__(self, decoder, params: dict, prefix_ids, max_len: int = 448,
                 eos_id: int = 0, max_tokens_per_chunk: int = 64):
        self.decoder = decoder
        self.params = params
        self.prefix_ids = list(prefix_ids)
        self.max_len = max_len
        self.eos_id = eos_id
        self.max_tokens_per_chunk = max_tokens_per_chunk
        self.tokens: list[int] = list(self.prefix_ids)
        self._self_cache = None  # persists across chunks

    def reset(self) -> None:
        self.tokens = list(self.prefix_ids)
        self._self_cache = None

    def _fresh_cache(self, encoder_out: jnp.ndarray) -> list[dict]:
        """New cross K/V for this chunk; keep (or create) the persistent
        self-attention cache."""
        cache = self.decoder.init_cache(self.params, encoder_out, max_len=self.max_len)
        if self._self_cache is not None:
            for layer, kept in zip(cache, self._self_cache):
                layer["self"] = kept
        return cache

    def _replay_tokens(self, cache: list[dict], upto: int, encoder_valid=None):
        """Prime a fresh cache with the already-emitted tokens (only needed
        when the self cache was rebuilt)."""
        for i in range(upto):
            cur = jnp.asarray([[self.tokens[i]]], dtype=jnp.int32)
            _, cache = self.decoder.decode_step(
                self.params, cur, cache, jnp.int32(i), encoder_valid=encoder_valid)
        return cache

    def process_chunk(self, encoder_out: jnp.ndarray,
                      encoder_valid: jnp.ndarray | None = None) -> list[int]:
        """Decode against one chunk's encoder output ([1, T, D]); returns the
        newly generated token ids (EOS terminates the chunk, not the
        stream)."""
        cache = self._fresh_cache(encoder_out)
        start = len(self.tokens)
        if self._self_cache is None and start > 1:
            cache = self._replay_tokens(cache, start - 1, encoder_valid)

        new_tokens: list[int] = []
        i = start - 1
        while i < self.max_len - 1 and len(new_tokens) < self.max_tokens_per_chunk:
            cur = jnp.asarray([[self.tokens[i]]], dtype=jnp.int32)
            logits, cache = self.decoder.decode_step(
                self.params, cur, cache, jnp.int32(i), encoder_valid=encoder_valid)
            nxt = int(np.asarray(jnp.argmax(logits, axis=-1))[0])
            if nxt == self.eos_id:
                break
            self.tokens.append(nxt)
            new_tokens.append(nxt)
            i += 1

        self._self_cache = [layer["self"] for layer in cache]
        return new_tokens


def transcribe_long_form(
    encoder,
    decoder,
    encoder_params: dict,
    decoder_params: dict,
    audio,
    prefix_ids,
    eos_id: int = 0,
    chunk_seconds: float = 30.0,
    sample_rate: int = 16_000,
    max_len: int = 448,
    max_tokens_per_chunk: int = 64,
    mel_fn=None,
) -> list[int]:
    """End-to-end long-form ASR: waveform of arbitrary length -> 30 s chunks
    -> log-mel -> encoder -> streaming decode with a persistent KV cache
    (BASELINE config 5). Returns all generated token ids (prefix excluded)."""
    import jax
    import jax.numpy as jnp

    from mocov2_whisper_flamingo_tpu.ops.mel import whisper_log_mel

    mel_fn = mel_fn or (lambda wav: whisper_log_mel(
        wav, pad_to=int(chunk_seconds * sample_rate)))
    chunk_samples = int(chunk_seconds * sample_rate)
    audio = jnp.asarray(audio)
    n_chunks = max(-(-audio.shape[-1] // chunk_samples), 1)

    encode = jax.jit(encoder.apply)
    stream = StreamingDecoder(decoder, decoder_params, prefix_ids,
                              max_len=max_len, eos_id=eos_id,
                              max_tokens_per_chunk=max_tokens_per_chunk)
    out: list[int] = []
    for i in range(n_chunks):
        chunk = audio[..., i * chunk_samples : (i + 1) * chunk_samples]
        features = encode(encoder_params, mel_fn(chunk)[None])
        out.extend(stream.process_chunk(features))
    return out
