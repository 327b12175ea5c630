"""Spoken-language identification from the encoder output.

openai ``whisper/decoding.py::detect_language``: feed only the SOT token,
mask every logit that is not a language token, softmax — the decoder's first
prediction after SOT is the language token, so its restricted distribution
IS the language posterior. The reference pins Vietnamese statically
(reference: datamodule/data_module.py:171-174 tokenizer language); HF
exposes the same probe via ``generate(task="transcribe")`` language
detection. One compiled ``decode_step`` dispatch; [B] batched.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def detect_language(
    decoder,
    params: dict,
    encoder_out: jnp.ndarray,
    sot_id: int,
    language_token_ids: Sequence[int],
    encoder_valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(best, probs)``: ``best`` [B] — the argmax language token
    id per example; ``probs`` [B, n_languages] — softmax over the given
    language tokens only (columns ordered as ``language_token_ids``).

    The caller maps token ids to language codes (tokenizer-dependent; e.g.
    HF Whisper's ``<|vi|>`` etc. ids). Differentiable-free, jit-safe."""
    lang_ids = jnp.asarray(list(language_token_ids), dtype=jnp.int32)
    if lang_ids.ndim != 1 or lang_ids.shape[0] == 0:
        raise ValueError("language_token_ids must be a non-empty 1-D list")
    b = encoder_out.shape[0]
    cache = decoder.init_cache(params, encoder_out, max_len=2)
    sot = jnp.full((b, 1), sot_id, jnp.int32)
    logits, _ = decoder.decode_step(params, sot, cache, jnp.int32(0),
                                    encoder_valid=encoder_valid)
    lang_logits = logits.astype(jnp.float32)[:, lang_ids]  # [B, n_lang]
    probs = jax.nn.softmax(lang_logits, axis=-1)
    best = lang_ids[jnp.argmax(lang_logits, axis=-1)]
    return best, probs
