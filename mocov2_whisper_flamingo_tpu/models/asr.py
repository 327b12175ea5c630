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
    ) -> jnp.ndarray:
        """wav -> token ids [B, max_len] (best beam when beam_size > 1).
        ``logit_rules``: optional ``decode.LogitRules`` with the HF-default
        Whisper suppress/forced/timestamp semantics."""
        mel = self.features(audio, pad_to=pad_to)
        enc = self.encode(params, mel)
        # Decoder params cast to the compute dtype ONCE (not per token step).
        prec = self.precision
        dec_params = jax.tree.map(
            lambda x: prec.cast(x) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params["decoder"])
        if beam_size <= 1:
            return greedy_decode(self.decoder, dec_params, enc,
                                 prefix_ids, max_len, eos_id,
                                 logit_rules=logit_rules)
        res: BeamResult = beam_search(self.decoder, dec_params, enc,
                                      prefix_ids, beam_size=beam_size,
                                      max_len=max_len, eos_id=eos_id,
                                      logit_rules=logit_rules)
        return res.sequences[:, 0]
