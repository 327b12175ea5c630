"""Checkpoint converters: torch state dicts -> JAX param pytrees.

Covers the reference's two pretrained-weight ingestion paths:
- HF ``openai/whisper-*`` (reference: av_net.py:22 loads whisper-small and
  freezes the encoder).
- MoCo v2 800-epoch ResNet-50 (reference: av_net.py:41-42 loads with
  ``strict=False`` so only the backbone keys that exist land — the same
  key-filtering semantics are reproduced here).

torch is used only host-side to read the checkpoint; everything returned is
numpy/jnp. Works with either a live torch module's ``state_dict()`` or a
``torch.load``-ed mapping.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _layer_norm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _conv1d(sd: Mapping, prefix: str) -> dict:
    # torch Conv1d weight [out, in, k] -> ours [k, in, out]
    p = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _attn(sd: Mapping, prefix: str) -> dict:
    return {
        "q": _linear(sd, f"{prefix}.q_proj"),
        "k": _linear(sd, f"{prefix}.k_proj"),  # no bias in HF whisper k_proj
        "v": _linear(sd, f"{prefix}.v_proj"),
        "out": _linear(sd, f"{prefix}.out_proj"),
    }


def whisper_encoder_from_torch(state_dict: Mapping, num_layers: int) -> dict:
    """HF ``WhisperModel`` (or ``.encoder``) state dict -> WhisperEncoder params."""
    sd = {k.removeprefix("model.").removeprefix("encoder."): v
          for k, v in state_dict.items() if "decoder." not in k}
    layers = []
    for i in range(num_layers):
        p = f"layers.{i}"
        layers.append({
            "self_attn": _attn(sd, f"{p}.self_attn"),
            "self_attn_ln": _layer_norm(sd, f"{p}.self_attn_layer_norm"),
            "mlp": {"fc1": _linear(sd, f"{p}.fc1"), "fc2": _linear(sd, f"{p}.fc2")},
            "mlp_ln": _layer_norm(sd, f"{p}.final_layer_norm"),
        })
    return {
        "conv1": _conv1d(sd, "conv1"),
        "conv2": _conv1d(sd, "conv2"),
        "pos_embed": _np(sd["embed_positions.weight"]),
        "layers": layers,
        "ln_post": _layer_norm(sd, "layer_norm"),
    }


def whisper_decoder_from_torch(state_dict: Mapping, num_layers: int) -> dict:
    """HF ``WhisperModel`` (or ``.decoder``) state dict -> WhisperDecoder params."""
    sd = {k.removeprefix("model.").removeprefix("decoder."): v
          for k, v in state_dict.items() if "encoder." not in k or k.startswith("decoder.")}
    sd = {k.removeprefix("decoder."): v for k, v in sd.items()}
    layers = []
    for i in range(num_layers):
        p = f"layers.{i}"
        layers.append({
            "self_attn": _attn(sd, f"{p}.self_attn"),
            "self_attn_ln": _layer_norm(sd, f"{p}.self_attn_layer_norm"),
            "cross_attn": _attn(sd, f"{p}.encoder_attn"),
            "cross_attn_ln": _layer_norm(sd, f"{p}.encoder_attn_layer_norm"),
            "mlp": {"fc1": _linear(sd, f"{p}.fc1"), "fc2": _linear(sd, f"{p}.fc2")},
            "mlp_ln": _layer_norm(sd, f"{p}.final_layer_norm"),
        })
    return {
        "embed_tokens": {"embedding": _np(sd["embed_tokens.weight"])},
        "pos_embed": _np(sd["embed_positions.weight"]),
        "layers": layers,
        "ln_post": _layer_norm(sd, "layer_norm"),
    }


# ---------------------------------------------------------------------------
# MoCo v2 ResNet-50
# ---------------------------------------------------------------------------


def _bn(sd: Mapping, prefix: str) -> dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def _conv2d(sd: Mapping, prefix: str) -> dict:
    # torch Conv2d weight [out, in, kh, kw] -> ours [kh, kw, in, out]
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}


def resnet50_from_moco(checkpoint: Mapping, init_params: dict) -> dict:
    """MoCo v2 checkpoint -> ResNet-50 body params, reproducing the
    reference's ``load_state_dict(strict=False)`` behavior: keys for the
    query encoder's layer1-4 land; the (replaced) stem and the MoCo MLP head
    are dropped; anything missing keeps its init value
    (reference: av_net.py:41-42, moco_visual_frontend.py:20-26).

    checkpoint: the raw ``torch.load`` result (with "state_dict") or a plain
    state-dict mapping. init_params: params from ``ResNet50Body.init`` —
    returned updated (copy) where checkpoint keys match.
    """
    sd = checkpoint.get("state_dict", checkpoint) if isinstance(checkpoint, Mapping) else checkpoint
    # MoCo v2 keys look like "module.encoder_q.layer1.0.conv1.weight".
    clean = {}
    for k, v in sd.items():
        k2 = k.removeprefix("module.").removeprefix("encoder_q.")
        clean[k2] = v

    import copy as _copy

    params = _copy.deepcopy(init_params)
    loaded, skipped = 0, []
    for stage_idx in (1, 2, 3, 4):
        stage_key = f"layer{stage_idx}"
        if stage_key not in params:
            continue
        for block_idx, block in enumerate(params[stage_key]):
            pfx = f"{stage_key}.{block_idx}"
            try:
                for conv_i in (1, 2, 3):
                    block[f"conv{conv_i}"] = _conv2d(clean, f"{pfx}.conv{conv_i}")
                    block[f"bn{conv_i}"] = _bn(clean, f"{pfx}.bn{conv_i}")
                if "downsample" in block:
                    block["downsample"] = {
                        "conv": _conv2d(clean, f"{pfx}.downsample.0"),
                        "bn": _bn(clean, f"{pfx}.downsample.1"),
                    }
                loaded += 1
            except KeyError as e:  # strict=False: leave init values in place
                skipped.append(f"{pfx}: {e}")
    params["_conversion_report"] = {"blocks_loaded": loaded, "skipped": skipped}
    return params
