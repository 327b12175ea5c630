"""Greedy autoregressive decode with a static KV cache.

The whole loop is one ``lax.scan`` under jit: static [B, max_len] shapes,
per-example EOS masking (no data-dependent Python control flow — XLA
semantics). The forced decoder prefix (<|startoftranscript|><|lang|>
<|task|><|notimestamps|>) is teacher-forced through the same scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_decode(
    decoder,
    params: dict,
    encoder_out: jnp.ndarray,
    prefix_ids,
    max_len: int = 224,
    eos_id: int = 0,
    encoder_valid: jnp.ndarray | None = None,
    logit_rules=None,
    cache_quant: str | None = None,
) -> jnp.ndarray:
    """Returns token ids [B, max_len] (prefix included, EOS-padded).

    decoder: a WhisperDecoder-like object with ``init_cache``/``decode_step``.
    prefix_ids: list/array of forced prefix tokens (same for the batch).
    logit_rules: optional ``decode.logit_rules.LogitRules`` applied to the
    step logits before the argmax (HF applies its processors to raw logits
    in greedy mode — masking/forcing commutes with argmax, so sharing one
    rules object with the beam path is exact).
    """
    b = encoder_out.shape[0]
    prefix = jnp.asarray(prefix_ids, dtype=jnp.int32)
    n_prefix = prefix.shape[0]

    cache = decoder.init_cache(params, encoder_out, max_len=max_len, quant=cache_quant)
    tokens0 = jnp.full((b, max_len), eos_id, dtype=jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(
        tokens0, jnp.broadcast_to(prefix[None], (b, n_prefix)), (0, 0))

    def step(carry, i):
        tokens, cache, done = carry
        cur = jax.lax.dynamic_slice(tokens, (0, i), (b, 1))
        logits, cache = decoder.decode_step(params, cur, cache, i,
                                            encoder_valid=encoder_valid)
        if logit_rules is not None:
            logits = logit_rules(logits, tokens, i + 1, int(n_prefix))
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
        # Within the forced prefix, the "prediction" is the next prefix token.
        in_prefix = (i + 1) < n_prefix
        forced = tokens[:, jnp.minimum(i + 1, max_len - 1)]
        nxt = jnp.where(in_prefix, forced, nxt)
        nxt = jnp.where(done, eos_id, nxt)
        done = done | ((nxt == eos_id) & ~in_prefix)
        write_col = jnp.minimum(i + 1, max_len - 1)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, write_col))
        return (tokens, cache, done), None

    done0 = jnp.zeros((b,), bool)
    (tokens, _, _), _ = jax.lax.scan(
        step, (tokens0, cache, done0), jnp.arange(max_len - 1))
    return tokens
