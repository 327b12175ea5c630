"""AVNet: the top-level audio-visual fusion model.

Preserves the reference's public contract (reference: av_net.py:15,67-109):

- constructor ``AVNet(modal, MoCofile, reqInpLen, modelargs, vocab_size,
  enable_logging)`` with ``modelargs = (d_model, n_heads, n_layers,
  pe_max_len, fc_hidden_size, dropout)`` (reference: train.py:65-72);
- ``forward(params, (audio, audio_mask, video, video_mask, video_len))``
  -> logits [B, T', vocab]:
  mel [B, 3000, 80] -> frozen Whisper encoder -> Linear(d_whisper->d) + LN +
  sinusoidal PE; video [B, T, 3, H, W] -> frozen MoCo frontend ->
  Linear(2048->d) + LN + PE; truncate both to min length; gated cross-attn
  fusion (audio queries, video keys/values, video padding mask); output =
  fused + audio + video residual sum; linear decoder head.

Reference quirks handled consciously (SURVEY.md §7):
- Q2: the reference passes ``~audioMask`` to the HF Whisper encoder, which
  ignores attention_mask entirely; only the *video* padding mask affects
  computation. We therefore drop the audio mask at the encoder (same math)
  and keep the video key-padding mask in fusion.
- Q4: the reference's unused ``fusion_scalar`` parameter and vestigial
  beam_width/lambda config keys are not reproduced.

The model is functional: ``init(key)`` returns the param pytree,
``forward``/``__call__`` are pure. Frozen submodules (Whisper encoder, MoCo
frontend — reference: av_net.py:25-26,45-46) are wrapped in
``jax.lax.stop_gradient`` so no backward graph is built for them, and the
trainable-param subtree is exposed via ``trainable_filter``.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mocov2_whisper_flamingo_tpu.models import layers as L
from mocov2_whisper_flamingo_tpu.models.fusion import GatedCrossModalFusion
from mocov2_whisper_flamingo_tpu.models.visual_frontend import MoCoVisualFrontend
from mocov2_whisper_flamingo_tpu.models.whisper import WhisperEncoder, config_for

logger = logging.getLogger(__name__)


class AVNet:
    def __init__(
        self,
        modal: str,
        MoCofile: str | None,
        reqInpLen: int,
        modelargs: Sequence[Any],
        vocab_size: int,
        enable_logging: bool = False,
        whisper_name: str = "whisper-small",
        precision: L.Precision = L.FP32,
        backend: str | None = None,
        remat: bool = False,
    ):
        if backend is None:
            from mocov2_whisper_flamingo_tpu.ops.attention import default_attention_backend

            backend = default_attention_backend()  # pallas on TPU, xla elsewhere
        d_model, n_heads, n_layers, pe_max_len, fc_hidden_size, dropout = modelargs
        self.modal = modal
        self.moco_file = MoCofile
        self.req_inp_len = reqInpLen
        self.enable_logging = enable_logging
        self.d_model = d_model
        self.n_heads = n_heads
        self.vocab_size = vocab_size
        self.pe_max_len = pe_max_len
        self.precision = precision
        self.backend = backend

        self.whisper_config = config_for(whisper_name)
        self.whisper_encoder = WhisperEncoder(self.whisper_config, precision, backend)
        self.visual_frontend = MoCoVisualFrontend(precision)
        # n_layers // 2 fusion blocks, as the reference wires it
        # (reference: av_net.py:51-57).
        self.fusion = GatedCrossModalFusion(
            d_model, n_heads, max(n_layers // 2, 1), dropout, precision, backend,
            remat=remat)

        # Fixed sinusoidal position tables (buffers, not params;
        # reference: models/utils.py:8-28 uses max_len 5000).
        self._pe = jnp.asarray(L.interleaved_position_encoding(max(pe_max_len, 5000), d_model))

    def set_attention_backend(self, backend: str) -> None:
        """Switch the attention backend on every submodule. Under tensor
        parallelism the flash-attention kernel now runs through ``shard_map``
        (ops/flash_attention.py::set_attention_mesh — Trainer wires it), so
        TP no longer needs a wholesale XLA fallback; this switch remains for
        platforms without Pallas and for the fused gated-attention kernel,
        which has no shard_map wrapper."""
        self.backend = backend
        self.whisper_encoder.backend = backend
        self.fusion.backend = backend

    # -- params ---------------------------------------------------------------

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 6)
        params = {
            "whisper_encoder": self.whisper_encoder.init(ks[0]),
            "audio_proj": L.linear_init(ks[1], self.whisper_config.d_model, self.d_model),
            "audio_ln": L.layer_norm_init(self.d_model),
            "visual_frontend": self.visual_frontend.init(ks[2]),
            "video_proj": L.linear_init(ks[3], MoCoVisualFrontend.OUT_DIM, self.d_model),
            "video_ln": L.layer_norm_init(self.d_model),
            "fusion": self.fusion.init(ks[4]),
            "decoder": L.linear_init(ks[5], self.d_model, self.vocab_size),
        }
        if self.moco_file and os.path.exists(self.moco_file):
            params["visual_frontend"]["body"] = self._load_moco(
                params["visual_frontend"]["body"])
        return params

    def _load_moco(self, init_body: dict) -> dict:
        import torch  # host-side checkpoint reading only

        from mocov2_whisper_flamingo_tpu.models.convert import resnet50_from_moco

        state = torch.load(self.moco_file, map_location="cpu", weights_only=False)
        body = resnet50_from_moco(state, init_body)
        report = body.pop("_conversion_report", {})
        logger.info("MoCo v2 checkpoint: %s blocks loaded, %d skipped",
                    report.get("blocks_loaded"), len(report.get("skipped", [])))
        return body

    def load_whisper_torch(self, params: dict, state_dict) -> dict:
        """Install pretrained HF Whisper encoder weights (reference loads
        openai/whisper-small at av_net.py:22)."""
        from mocov2_whisper_flamingo_tpu.models.convert import whisper_encoder_from_torch

        params = dict(params)
        params["whisper_encoder"] = jax.tree.map(
            jnp.asarray,
            whisper_encoder_from_torch(state_dict, self.whisper_config.encoder_layers))
        return params

    @staticmethod
    def trainable_filter(path: tuple, _leaf=None) -> bool:
        """True for trainable leaves: everything except the frozen Whisper
        encoder and MoCo frontend (reference: av_net.py:25-26,45-46)."""
        root = path[0] if path else ""
        name = getattr(root, "key", root)
        return name not in ("whisper_encoder", "visual_frontend")

    def quantize_frozen_params(self, params: dict) -> dict:
        """Weight-only int8 for the frozen Whisper-encoder kernels inside
        the TRAIN step (w8a16; see WhisperEncoder.quantize_encoder_params).
        Trainable subtrees pass through untouched, so `trainable_filter`,
        the optimizer mask, and checkpoints keep working on the returned
        tree — frozen leaves are excluded from updates either way; they are
        simply stored (and re-read each step) at half the HBM bytes."""
        params = dict(params)
        params["whisper_encoder"] = self.whisper_encoder.quantize_encoder_params(
            params["whisper_encoder"])
        return params

    def cast_frozen_params(self, params: dict, dtype=jnp.bfloat16) -> dict:
        """bf16 STORAGE for the frozen subtrees (Whisper encoder + MoCo
        frontend) in the train step. The step is dominated by the frozen
        forward (BASELINE.md train sweep: 25.9% MFU ceiling at B=16), whose
        weights are never differentiated (``stop_gradient`` above) yet are
        stored fp32 and cast to bf16 at every use — so each step re-reads
        ~2x the necessary frozen bytes from HBM. Storing them bf16 makes
        the per-use cast a no-op and halves that read, with no dequantizing
        dot (the lowering that made int8 frozen weights 31x SLOWER on v5e,
        BASELINE.md round-4 A/B). Numerics: matmul/conv operands were
        already bf16-rounded at use under the BF16 policy; only the fp32
        LayerNorm/BN-affine islands now see bf16-rounded weights — measure
        the loss delta via ``bench.py --train --train-frozen-cast ab``.
        Trainable subtrees pass through untouched; keep fp32 masters in
        checkpoints and cast at placement (training.frozen_param_dtype)."""
        def cast(x):
            return (x.astype(dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x)

        params = dict(params)
        params["whisper_encoder"] = jax.tree.map(cast, params["whisper_encoder"])
        params["visual_frontend"] = jax.tree.map(cast, params["visual_frontend"])
        return params

    # -- forward ----------------------------------------------------------------

    def forward(
        self,
        params: dict,
        input_batch: tuple,
        train: bool = False,
        rng: jax.Array | None = None,
        return_gates: bool = False,
    ):
        """input_batch: (audio [B,3000,80], audio_mask [B,3000] True=valid,
        video [B,T,3,H,W], video_mask, video_len [B]) — the reference 5-tuple
        (reference: av_net.py:71). Returns logits [B, min_len, vocab]."""
        audio, audio_mask, video, video_mask, video_len = input_batch
        prec = self.precision

        if self.enable_logging:
            logger.info("AVNet forward: audio %s video %s", audio.shape, video.shape)

        # AUDIO: [B, 3000, 80] -> [B, 80, 3000] -> frozen Whisper encoder.
        if audio.shape[1] == 3000 and audio.shape[2] == 80:
            mel = jnp.swapaxes(audio, 1, 2)
        else:
            mel = audio
        whisper_out = self.whisper_encoder.apply(params["whisper_encoder"], mel)
        whisper_out = jax.lax.stop_gradient(whisper_out)  # frozen encoder

        audio_feat = L.layer_norm(
            params["audio_ln"], L.linear(params["audio_proj"], prec.cast(whisper_out), prec))
        audio_feat = audio_feat + prec.cast(self._pe[: audio_feat.shape[1]])

        # VIDEO: frozen MoCo frontend -> project -> LN -> PE.
        video_raw = self.visual_frontend.apply(
            params["visual_frontend"], prec.cast(video), video_len)
        video_raw = jax.lax.stop_gradient(video_raw)  # frozen backbone
        video_feat = L.layer_norm(
            params["video_ln"], L.linear(params["video_proj"], video_raw, prec))
        video_feat = video_feat + prec.cast(self._pe[: video_feat.shape[1]])

        # Align: truncate both streams to the shorter (static) length
        # (reference: av_net.py:92-96 — audio 1500 -> video length).
        # jax.core.min_dim instead of Python min: it stays a symbolic
        # expression under a polymorphic video-time axis (export_model
        # symbolic_time), where `<` between dims is undecidable.
        min_len = jax.core.min_dim(audio_feat.shape[1], video_feat.shape[1])
        audio_feat = audio_feat[:, :min_len]
        video_feat = video_feat[:, :min_len]
        video_len = jnp.minimum(video_len, min_len)

        # Fusion with the video validity mask (True = valid here; the
        # reference builds the inverse pad mask at av_net.py:111-114).
        video_valid = jnp.arange(min_len)[None, :] < video_len[:, None]
        fused = self.fusion.apply(
            params["fusion"], audio_feat, video_feat, video_valid,
            train=train, rng=rng, return_gates=return_gates)
        if return_gates:
            fused, gates = fused

        out = fused + audio_feat + video_feat  # residual sum (av_net.py:106)
        logits = L.linear(params["decoder"], out, prec).astype(jnp.float32)

        if return_gates:
            return logits, gates
        return logits

    def forward_features(
        self,
        params: dict,
        input_batch: tuple,
        train: bool = False,
        rng: jax.Array | None = None,
    ) -> tuple:
        """Pre-decoder fused features and the audio-branch features, both
        [B, T', D] — the surface the notebook-era feature-alignment trainer
        consumed (reference: train.ipynb cell 2 computes an MSE between the
        model's feature output and the audio stream; see
        training/task.py FeatureAlign notes for the shape reconciliation)."""
        audio, audio_mask, video, video_mask, video_len = input_batch
        prec = self.precision

        mel = (jnp.swapaxes(audio, 1, 2)
               if audio.shape[1] == 3000 and audio.shape[2] == 80 else audio)
        whisper_out = jax.lax.stop_gradient(
            self.whisper_encoder.apply(params["whisper_encoder"], mel))
        audio_feat = L.layer_norm(
            params["audio_ln"], L.linear(params["audio_proj"], prec.cast(whisper_out), prec))
        audio_feat = audio_feat + prec.cast(self._pe[: audio_feat.shape[1]])

        video_raw = jax.lax.stop_gradient(self.visual_frontend.apply(
            params["visual_frontend"], prec.cast(video), video_len))
        video_feat = L.layer_norm(
            params["video_ln"], L.linear(params["video_proj"], video_raw, prec))
        video_feat = video_feat + prec.cast(self._pe[: video_feat.shape[1]])

        min_len = min(audio_feat.shape[1], video_feat.shape[1])
        audio_feat = audio_feat[:, :min_len]
        video_feat = video_feat[:, :min_len]
        video_len = jnp.minimum(video_len, min_len)
        video_valid = jnp.arange(min_len)[None, :] < video_len[:, None]
        fused = self.fusion.apply(params["fusion"], audio_feat, video_feat,
                                  video_valid, train=train, rng=rng)
        return fused + audio_feat + video_feat, audio_feat

    __call__ = forward
