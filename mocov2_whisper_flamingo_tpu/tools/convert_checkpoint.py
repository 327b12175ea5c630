#!/usr/bin/env python
"""Convert pretrained torch checkpoints into this framework's orbax format.

The reference ingests weights in-process (HF Whisper at av_net.py:22, MoCo
v2 at av_net.py:41-42); this CLI makes conversion an explicit, inspectable
step that produces a ready-to-restore orbax checkpoint:

  # HF Whisper (a local directory with pytorch_model.bin, or a .bin/.pt file)
  python -m mocov2_whisper_flamingo_tpu.tools.convert_checkpoint \
      --kind whisper --size whisper-small --input /path/to/model.bin \
      --output converted/whisper_small

  # MoCo v2 ResNet-50
  python -m mocov2_whisper_flamingo_tpu.tools.convert_checkpoint \
      --kind moco --input moco_v2_800ep_pretrain.pth.tar --output converted/moco
"""

from __future__ import annotations

import argparse
import logging
import os

logger = logging.getLogger("convert_checkpoint")


def load_torch_state_dict(path: str):
    import torch

    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.pt", "model.bin"):
            candidate = os.path.join(path, name)
            if os.path.exists(candidate):
                path = candidate
                break
    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        return state["state_dict"]
    return state


def convert_whisper(state_dict, size: str) -> dict:
    import jax.numpy as jnp
    import jax

    from mocov2_whisper_flamingo_tpu.models.convert import (
        whisper_decoder_from_torch, whisper_encoder_from_torch)
    from mocov2_whisper_flamingo_tpu.models.whisper import config_for

    cfg = config_for(size)
    return jax.tree.map(jnp.asarray, {
        "encoder": whisper_encoder_from_torch(state_dict, cfg.encoder_layers),
        "decoder": whisper_decoder_from_torch(state_dict, cfg.decoder_layers),
    })


def convert_moco(checkpoint) -> dict:
    import jax

    from mocov2_whisper_flamingo_tpu.models.convert import resnet50_from_moco
    from mocov2_whisper_flamingo_tpu.models.visual_frontend import ResNet50Body

    init = ResNet50Body().init(jax.random.PRNGKey(0))
    body = resnet50_from_moco(checkpoint, init)
    report = body.pop("_conversion_report", {})
    logger.info("MoCo conversion: %s blocks loaded, %d skipped",
                report.get("blocks_loaded"), len(report.get("skipped", [])))
    return body


def save_orbax(params: dict, path: str) -> None:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params)
    ckpt.wait_until_finished()
    logger.info("wrote orbax checkpoint to %s", path)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--kind", choices=["whisper", "moco"], required=True)
    parser.add_argument("--input", required=True, help="torch checkpoint path/dir")
    parser.add_argument("--output", required=True, help="orbax output dir")
    parser.add_argument("--size", default="whisper-small",
                        help="whisper size name (whisper kind only)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    state = load_torch_state_dict(args.input)
    if args.kind == "whisper":
        params = convert_whisper(state, args.size)
    else:
        params = convert_moco(state)
    save_orbax(params, args.output)
    print(f"CONVERTED {args.kind} -> {args.output}")


if __name__ == "__main__":
    main()
