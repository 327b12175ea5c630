"""The AVSR task: joint CTC + label-smoothed CE loss, greedy decode, WER.

Capability parity with the reference LightningModule (reference:
train.py:33-246):
- ``loss = ctc + ce`` with CTC over log-softmaxed logits using the
  downsampled audio lengths (train.py:157-165) and CE over logits/targets
  trimmed to their common length (train.py:103-128);
- greedy per-frame argmax decode + tokenizer batch_decode with special
  tokens skipped (train.py:130-141);
- corpus WER (train.py:195).

Quirk Q3 (SURVEY.md §7): the reference pads targets with 0 (not -100,
data_module.py:134-137) while CE ignores only -100, and CTC blank=0 collides
with a real token id. ``pad_to_ignore=True`` (default False for parity)
remaps trailing pad positions to -100 before the CE.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from mocov2_whisper_flamingo_tpu.ops.losses import ctc_loss, label_smoothed_cross_entropy


@dataclasses.dataclass
class AVSRTask:
    """``loss_mode``:

    - ``"ctc_ce"`` (default): joint CTC + label-smoothed CE, the committed
      trainer (reference: train.py:33-246).
    - ``"feature_mse"``: the notebook-era feature-alignment objective
      (reference: train.ipynb cell 2): MSE between the model's fused
      feature output and the audio stream, with a cosine-similarity metric
      on time-pooled features. The notebook compared features against the
      raw mel batch through an older, shape-incompatible AVNet API; the
      coherent reconstruction is MSE(fused_features, audio_branch_features)
      — both [B, T', D] — which is the only pairing that type-checks in the
      committed AVNet and preserves the objective's intent (teach the
      trainable fusion to stay close to the audio stream while admitting
      visual signal through the gates).
    """

    net: Any
    label_smoothing: float = 0.1
    ctc_blank: int = 0
    pad_to_ignore: bool = False
    loss_mode: str = "ctc_ce"
    # Optional on-device augmentation ``(batch, key) -> batch`` applied
    # inside the jitted train step (train=True only) — built by
    # ``ops.augment.make_batch_augment`` when augmentation.on_device is set.
    augment_fn: Any = None

    # -- losses -----------------------------------------------------------------

    def compute_losses(self, logits: jnp.ndarray, batch: dict) -> dict:
        """logits: [B, T', V]; batch carries target_ids [B, L],
        target_lengths [B], audio_lengths [B]."""
        targets = batch["target_ids"]
        target_lengths = jnp.reshape(batch["target_lengths"], (-1,))
        input_lengths = jnp.minimum(
            jnp.reshape(batch["audio_lengths"], (-1,)), logits.shape[1])

        ctc = ctc_loss(
            logits, targets, input_lengths, target_lengths, blank_id=self.ctc_blank)

        t_min = min(logits.shape[1], targets.shape[1])
        ce_targets = targets[:, :t_min]
        if self.pad_to_ignore:
            pos = jnp.arange(t_min)[None, :]
            ce_targets = jnp.where(pos < target_lengths[:, None], ce_targets, -100)
        ce = label_smoothed_cross_entropy(
            logits[:, :t_min], ce_targets, label_smoothing=self.label_smoothing)
        return {"ctc_loss": ctc, "ce_loss": ce, "loss": ctc + ce}

    def feature_mse_losses(self, params: dict, batch: dict,
                           rng: jax.Array | None = None,
                           train: bool = True) -> dict:
        input_data = (batch["audio"], batch["audio_mask"], batch["video"],
                      batch["video_mask"], batch["video_lengths"])
        features, audio_feat = self.net.forward_features(
            params, input_data, train=train, rng=rng)
        features = features.astype(jnp.float32)
        audio_feat = jax.lax.stop_gradient(audio_feat).astype(jnp.float32)
        mse = jnp.mean(jnp.square(features - audio_feat))
        fm = jnp.mean(features, axis=1)
        am = jnp.mean(audio_feat, axis=1)
        cos = jnp.sum(fm * am, axis=-1) / jnp.maximum(
            jnp.linalg.norm(fm, axis=-1) * jnp.linalg.norm(am, axis=-1), 1e-8)
        return {"loss": mse, "cosine_sim": jnp.mean(cos)}

    def loss_fn(self, params: dict, batch: dict, rng: jax.Array | None = None,
                train: bool = True) -> tuple[jnp.ndarray, dict]:
        if train and self.augment_fn is not None and rng is not None:
            rng, k_aug = jax.random.split(rng)
            batch = self.augment_fn(batch, k_aug)
        if self.loss_mode == "feature_mse":
            losses = self.feature_mse_losses(params, batch, rng, train)
            return losses["loss"], losses
        input_data = (batch["audio"], batch["audio_mask"], batch["video"],
                      batch["video_mask"], batch["video_lengths"])
        logits = self.net.forward(params, input_data, train=train, rng=rng)
        losses = self.compute_losses(logits, batch)
        return losses["loss"], losses

    # -- steps -------------------------------------------------------------------

    def make_train_step(self, optimizer, skip_nonfinite: bool = True):
        """Returns a pure jittable train step: (params, opt_state, batch, rng)
        -> (params, opt_state, metrics). Grad reduction across the data mesh
        axis is emitted by XLA from the shardings (the NCCL AllReduce analog,
        SURVEY.md §2.2).

        ``skip_nonfinite``: failure detection in the update path — a step
        whose loss is NaN/Inf applies zero updates instead of corrupting the
        params (the reference only *observes* blow-ups via zero_infinity and
        a print, train.py:88,117-121); ``losses["skipped"]`` reports it.
        """

        def step(params, opt_state, batch, rng):
            # allow_int: frozen subtrees may carry int8 w8a16 kernels
            # (AVNet.quantize_frozen_params); their float0 cotangents are
            # normalized to integer zeros so optax sees a uniform tree
            # (they are masked from updates anyway, and XLA folds the
            # resulting add-zero away).
            (loss, losses), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True, allow_int=True)(
                params, batch, rng, True)
            grads = jax.tree.map(
                lambda g, p: g if jnp.issubdtype(p.dtype, jnp.inexact)
                else jnp.zeros_like(p), grads, params)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            if skip_nonfinite:
                # A poisoned step applies NO update at all (zeroing grads
                # alone would still apply weight decay) and leaves the
                # optimizer state untouched.
                ok = jnp.isfinite(loss)
                updates = jax.tree.map(lambda u: jnp.where(ok, u, 0.0), updates)
                new_opt_state = jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o) if hasattr(n, "shape") else n,
                    new_opt_state, opt_state)
                losses = dict(losses, skipped=(~ok).astype(jnp.float32))
            params = jax.tree.map(
                lambda p, u: p + u.astype(p.dtype)
                if u is not None and jnp.issubdtype(p.dtype, jnp.inexact)
                else p,
                params, updates)
            return params, new_opt_state, losses

        return step

    def make_eval_step(self):
        if self.loss_mode == "feature_mse":
            def step(params, batch):
                losses = self.feature_mse_losses(params, batch, train=False)
                # No decode in feature-pretraining mode; dummy predictions
                # keep the trainer's eval-loop signature uniform.
                preds = jnp.zeros((batch["target_ids"].shape[0], 1), jnp.int32)
                return losses, preds

            return step

        def step(params, batch):
            input_data = (batch["audio"], batch["audio_mask"], batch["video"],
                          batch["video_mask"], batch["video_lengths"])
            logits = self.net.forward(params, input_data, train=False)
            losses = self.compute_losses(logits, batch)
            preds = jnp.argmax(logits, axis=-1)
            return losses, preds

        return step

    # -- decode ---------------------------------------------------------------

    @staticmethod
    def decode_predictions(pred_ids, tokenizer) -> list[str]:
        """Greedy argmax ids -> text (reference: train.py:130-141)."""
        import numpy as np

        return tokenizer.batch_decode(np.asarray(pred_ids), skip_special_tokens=True)
