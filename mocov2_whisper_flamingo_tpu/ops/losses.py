"""Training losses: CTC (log-semiring forward under ``lax.scan``) and
label-smoothed cross-entropy.

Numerics match the reference's torch losses so parity runs are comparable:
- ``ctc_loss`` ~ ``nn.CTCLoss(blank=0, reduction='mean', zero_infinity=True)``
  (reference: train.py:85-89) including torch's reduction semantics (each
  example's loss divided by its target length before batch-averaging).
- ``label_smoothed_cross_entropy`` ~ ``nn.CrossEntropyLoss(ignore_index=-100,
  label_smoothing=0.1)`` (reference: train.py:90-93).

TPU notes: the CTC recursion is a single ``lax.scan`` over time with the whole
batch vectorized per step (the per-step work is an elementwise 3-way
log-sum-exp over [B, S] — VPU work; no data-dependent shapes). Per-example
input/target lengths are handled with masks, never dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _log_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    mx = jnp.maximum(a, b)
    dead = mx <= NEG_INF
    mx_safe = jnp.where(dead, 0.0, mx)
    s = jnp.exp(a - mx_safe) + jnp.exp(b - mx_safe)
    # Guard the log so the dead branch contributes zero gradient instead of
    # inf * 0 = NaN under autodiff.
    s = jnp.where(dead, 1.0, s)
    out = mx_safe + jnp.log(s)
    return jnp.where(dead, NEG_INF, out)


def ctc_forward_log_probs(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-example negative log likelihood of the CTC alignment lattice.

    log_probs: [B, T, V] log-softmax outputs.
    labels:    [B, L] target ids (padding value arbitrary; masked by length).
    input_lengths:  [B] number of valid frames.
    label_lengths:  [B] number of valid target tokens.
    Returns [B] NLL (un-normalized, like torch's reduction='none').
    """
    b, t, _ = log_probs.shape
    l = labels.shape[1]
    s = 2 * l + 1

    # Extended label sequence: blank, y1, blank, y2, ..., blank.
    pos = jnp.arange(s)
    is_label = pos % 2 == 1
    label_idx = jnp.clip((pos - 1) // 2, 0, l - 1)
    ext = jnp.where(is_label[None, :], jnp.take_along_axis(
        labels, jnp.broadcast_to(label_idx[None, :], (b, s)), axis=1), blank_id)  # [B, S]

    # Skip transition s-2 -> s allowed when ext[s] is a label differing from
    # ext[s-2].
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank_id)[:, :s]
    allow_skip = is_label[None, :] & (ext != ext_m2)  # [B, S]

    # Valid lattice positions: s < 2*label_len + 1.
    valid_pos = pos[None, :] < (2 * label_lengths[:, None] + 1)

    # Per-frame emission scores for each lattice position: [B, T, S].
    emit = jnp.take_along_axis(
        log_probs, jnp.broadcast_to(ext[:, None, :], (b, t, s)), axis=2)

    alpha0 = jnp.full((b, s), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_lengths > 0, emit[:, 0, 1], NEG_INF))

    def step(alpha, inputs):
        emit_t, t_idx = inputs
        shift1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :s]
        shift2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :s]
        shift2 = jnp.where(allow_skip, shift2, NEG_INF)
        new = _log_add(_log_add(alpha, shift1), shift2) + emit_t
        new = jnp.where(valid_pos, new, NEG_INF)
        # Freeze alpha past each example's input length.
        active = (t_idx < input_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    alpha_final, _ = jax.lax.scan(
        step, alpha0, (jnp.swapaxes(emit[:, 1:], 0, 1), jnp.arange(1, t)))

    # Final states: positions 2*L and 2*L - 1 of the extended sequence.
    end = 2 * label_lengths
    a_end = jnp.take_along_axis(alpha_final, end[:, None], axis=1)[:, 0]
    a_end_m1 = jnp.take_along_axis(
        alpha_final, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0]
    a_end_m1 = jnp.where(label_lengths > 0, a_end_m1, NEG_INF)
    return -_log_add(a_end, a_end_m1)


def ctc_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    zero_infinity: bool = True,
    reduction: str = "mean",
) -> jnp.ndarray:
    """CTC loss over raw (pre-softmax) logits [B, T, V].

    Matches ``nn.CTCLoss(blank=blank_id, reduction='mean',
    zero_infinity=True)`` applied to log-softmaxed logits as the reference
    does (reference: train.py:95-101): with ``reduction="mean"`` each
    example's NLL is divided by its target length, then averaged over the
    batch. ``zero_infinity`` zeroes non-finite losses (degenerate cases where
    input is shorter than the collapsed target).
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = ctc_forward_log_probs(log_probs, labels, input_lengths, label_lengths, blank_id)
    if zero_infinity:
        bad = ~jnp.isfinite(nll) | (nll >= -NEG_INF * 0.5)
        nll = jnp.where(bad, 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    denom = jnp.maximum(label_lengths, 1).astype(nll.dtype)
    return jnp.mean(nll / denom)


def label_smoothed_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    label_smoothing: float = 0.1,
    ignore_index: int = -100,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Label-smoothed CE over [..., V] logits and integer targets [...].

    torch semantics: ``loss = (1 - eps) * nll(target) + eps * mean_k(-logp_k)``
    with tokens equal to ``ignore_index`` excluded from the mean
    (reference: train.py:90-93,103-128).
    """
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = targets != ignore_index
    safe_targets = jnp.where(mask, targets, 0)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    loss = jnp.where(mask, loss, 0.0)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    count = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(loss) / count
