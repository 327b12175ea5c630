"""Optimizer and LR schedule.

Matches the reference's recipe (reference: train.py:218-246): AdamW with
betas (0.9, 0.98), eps 1e-6, weight decay 0.01, gradient clipping 1.0,
gradient accumulation x4, and a OneCycle schedule with linear anneal
(pct_start = warmup_ratio, div_factor 25, final_div_factor 1e4).

Frozen submodules (Whisper encoder, MoCo frontend) are excluded from both
updates and optimizer state via ``optax.masked`` — the TPU-native equivalent
of the reference's requires_grad=False + DDP find_unused_parameters
(reference: av_net.py:25-26,45-46, train.py:319).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax


def one_cycle_lr(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.1,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> Callable:
    """torch OneCycleLR(anneal_strategy='linear') semantics: linear ramp
    initial_lr -> max_lr over pct_start*total_steps, then linear decay to
    initial_lr/final_div_factor over the rest."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch reaches max_lr at step pct_start*total - 1 and min_lr at the
    # final step (its phase end_steps are `pct*total - 1` and `total - 1`).
    warmup_steps = max(int(round(total_steps * pct_start)) - 1, 1)
    decay_steps = max(total_steps - 1 - warmup_steps, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(initial_lr, max_lr, warmup_steps),
            optax.linear_schedule(max_lr, min_lr, decay_steps),
        ],
        boundaries=[warmup_steps],
    )


def no_decay_mask(params: Any) -> Any:
    """True for leaves that SHOULD receive weight decay. Biases, LayerNorm
    scales/biases, and the scalar fusion gates are exempt — the no-decay
    param-group split the reference's notebook trainer used
    (reference: train.ipynb cell 2)."""

    def keep_decay(path, leaf):
        names = {str(getattr(p, "key", p)) for p in path}
        if names & {"bias", "scale", "attn_gate", "ff_gate"}:
            return False
        return getattr(leaf, "ndim", 0) >= 2

    return jax.tree_util.tree_map_with_path(keep_decay, params)


def make_optimizer(
    training_config: Any,
    total_steps: int,
    trainable_mask: Any = None,
    decay_mask: Any = None,
) -> tuple[optax.GradientTransformation, Callable]:
    """Build the full optax chain. ``trainable_mask`` is a pytree of bools
    (True = trainable) matching the param tree; frozen leaves receive zero
    updates and no optimizer state. ``decay_mask`` (optional) restricts
    weight decay to matmul-shaped weights (see ``no_decay_mask``)."""
    schedule = one_cycle_lr(
        max_lr=training_config["max_lr"],
        total_steps=total_steps,
        pct_start=training_config.get("warmup_ratio", 0.1),
    )
    opt = optax.chain(
        optax.clip_by_global_norm(training_config.get("gradient_clip_val", 1.0)),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.98,
            eps=1e-6,
            weight_decay=training_config.get("weight_decay", 0.01),
            mask=decay_mask,
        ),
    )
    if trainable_mask is not None:
        opt = optax.masked(opt, trainable_mask)
    accum = int(training_config.get("accumulate_grad_batches", 1) or 1)
    if accum > 1:
        # Micro-batch accumulation: updates apply every `accum` steps; the
        # schedule advances per optimizer update, like Lightning's
        # accumulate_grad_batches (reference: train.py:322).
        opt = optax.MultiSteps(opt, every_k_schedule=accum)
    return opt, schedule


def trainable_mask_for(net, params: Any) -> Any:
    """Bool pytree from the net's ``trainable_filter`` (frozen Whisper/MoCo
    excluded)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: bool(net.trainable_filter(path)), params)
