"""KV-cached beam search under jit.

Hard part #2 from SURVEY.md §7: the whole search is compiled — static
[B, K, L] shapes, beams flattened into the batch for the decoder step, and
EOS masking instead of early Python exits.

Design notes (TPU, each measured — see docs/DESIGN.md):
- the decode step runs on [B*K] rows so the MXU sees one batched matmul per
  projection rather than K small ones;
- the loop is a fixed-trip-count ``lax.scan`` (finished beams no-op via
  masking); ``while_loop``/``cond`` serialize with ~200 ms/step host
  round-trips on remote-execution backends (``early_exit=True`` restores the
  dynamic loop where that's profitable);
- beam reordering is a one-hot K x K matmul, not ``take_along_axis`` — the
  general gather lowers ~100x slower on large KV caches;
- only the SELF-attention caches are reordered; cross K/V rows are
  beam-invariant by construction (computed from the repeated encoder
  output) and the cross cache is computed once per utterance;
- scores use the standard log-sum trick with finished-beam freezing: a done
  beam only proposes EOS at zero incremental cost, so its score is stable
  and comparable under the final length normalization.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass
class BeamResult:
    sequences: jnp.ndarray  # [B, K, L] token ids, best beam first
    scores: jnp.ndarray     # [B, K] length-normalized log probs


def _gather_beams(tree, beam_idx: jnp.ndarray, b: int, k: int):
    """Reorder the leading [B*K] axis of every leaf by per-batch beam index
    [B, K].

    Implemented as a one-hot matmul (perm [B, K, K] against the beam axis)
    rather than take_along_axis: general gathers lower poorly on TPU for
    large operands (measured ~200ms/step on the KV caches), while the K x K
    permutation contraction is MXU work XLA handles at full speed.
    """
    perm = (beam_idx[..., None] == jnp.arange(k)[None, None, :])  # [B, K_new, K_old]

    def gather(leaf):
        shaped = leaf.reshape(b, k, -1)  # [B, K_old, F]
        p = perm.astype(leaf.dtype if jnp.issubdtype(leaf.dtype, jnp.floating)
                        else jnp.float32)
        out = jax.lax.dot_general(
            p, shaped.astype(p.dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=p.dtype)  # [B, K_new, F]
        return out.astype(leaf.dtype).reshape(b * k, *leaf.shape[1:])

    return jax.tree.map(gather, tree)


def beam_search(
    decoder,
    params: dict,
    encoder_out: jnp.ndarray,
    prefix_ids,
    beam_size: int = 5,
    max_len: int = 224,
    eos_id: int = 0,
    length_penalty: float = 1.0,
    encoder_valid: jnp.ndarray | None = None,
    early_exit: bool = False,
) -> BeamResult:
    """Batched beam search. Returns sequences sorted best-first per example."""
    b = encoder_out.shape[0]
    k = beam_size
    prefix = jnp.asarray(prefix_ids, dtype=jnp.int32)
    n_prefix = int(prefix.shape[0])
    v = decoder.config.vocab_size

    # Self caches get B*K rows; the cross K/V stays B-major (beam rows would
    # be identical copies) — each example's cross cache is computed and read
    # once per step regardless of beam width, and never reordered.
    enc_valid = encoder_valid
    cache = decoder.init_cache(params, encoder_out, max_len=max_len, beam_groups=k)

    tokens = jnp.full((b, k, max_len), eos_id, dtype=jnp.int32)
    tokens = tokens.at[:, :, :n_prefix].set(prefix[None, None, :])
    # Beam 0 active, others at -inf so the first expansion draws K distinct
    # continuations of the single prefix.
    scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (k - 1))[None], (b, 1))
    done = jnp.zeros((b, k), bool)

    # Teacher-force the prefix through the cache (all beams identical here).
    def prefix_step(carry, i):
        cache = carry
        cur = jnp.broadcast_to(prefix[i], (b * k, 1)).astype(jnp.int32)
        _, cache = decoder.decode_step(params, cur, cache, i, encoder_valid=enc_valid)
        return cache, None

    if n_prefix > 1:
        cache, _ = jax.lax.scan(prefix_step, cache, jnp.arange(n_prefix - 1))

    def cond(state):
        i, tokens, scores, done, cache = state
        return (i < max_len - 1) & ~jnp.all(done)

    def body(state):
        i, tokens, scores, done, cache = state
        del state
        cur = jax.lax.dynamic_slice_in_dim(
            tokens.reshape(b * k, max_len), i, 1, axis=1)
        logits, cache = decoder.decode_step(params, cur, cache, i,
                                            encoder_valid=enc_valid)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [B*K, V]
        logp = logp.reshape(b, k, v)

        # Finished beams: only EOS, at zero cost (score frozen).
        eos_only = jnp.full((v,), NEG_INF).at[eos_id].set(0.0)
        logp = jnp.where(done[..., None], eos_only[None, None, :], logp)

        total = scores[..., None] + logp  # [B, K, V]
        flat = total.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(flat, k)  # [B, K]
        beam_idx = top_idx // v
        token_idx = (top_idx % v).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, beam_idx[..., None], axis=1)
        done = jnp.take_along_axis(done, beam_idx, axis=1)
        # Only the SELF-attention caches depend on beam history; the cross
        # K/V rows are identical across beams of an example (computed from
        # the repeated encoder output), so reordering them is a mathematical
        # no-op — skipping it removes ~70% of the per-step gather traffic.
        cache = [
            {"self": _gather_beams(layer["self"], beam_idx, b, k),
             "cross": layer["cross"]}
            for layer in cache
        ]

        token_idx = jnp.where(done, eos_id, token_idx)
        tokens = jax.lax.dynamic_update_slice(
            tokens, token_idx[..., None], (0, 0, i + 1))
        done = done | (token_idx == eos_id)
        return (i + 1, tokens, top_scores, done, cache)

    state = (jnp.int32(n_prefix - 1), tokens, scores, done, cache)
    if early_exit:
        # Dynamic trip count: stops as soon as every beam is finished. NOTE:
        # some remote-execution backends (e.g. the axon tunnel) serialize
        # while_loop iterations with host round-trips — prefer the scan form
        # there (default).
        _, tokens, scores, done, _ = jax.lax.while_loop(cond, body, state)
    else:
        # Fixed trip count under lax.scan: one device dispatch, fully
        # pipelined. No data-dependent control flow at all — finished beams
        # no-op via masking (done beams only propose EOS at zero cost), so
        # running the body past all-done is a (correct) no-op. This matters
        # on remote-execution backends where while_loop/cond serialize with
        # host round-trips (~200ms/step measured through the axon tunnel).
        def scan_body(state, _):
            return body(state), None

        state, _ = jax.lax.scan(scan_body, state, None,
                                length=max_len - n_prefix)
        _, tokens, scores, done, _ = state

    # Length-normalized scores (Whisper-style avg log prob): count generated
    # tokens (exclude the prefix; include the terminating EOS position).
    gen_mask = (tokens != eos_id)
    gen_len = jnp.maximum(jnp.sum(gen_mask, axis=-1) - n_prefix + 1, 1)
    norm_scores = scores / jnp.power(gen_len.astype(jnp.float32), length_penalty)

    order = jnp.argsort(-norm_scores, axis=-1)
    tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
    norm_scores = jnp.take_along_axis(norm_scores, order, axis=1)
    return BeamResult(sequences=tokens, scores=norm_scores)
