#!/usr/bin/env python
"""Training entry point.

Capability parity with the reference trainer (reference: train.py:249-336):
config -> tokenizer -> DataModule -> AVNet -> callbacks (top-k checkpoints,
early stopping, LR logging) -> fit -> test. Differences by design: a real
CLI (the reference hard-codes everything incl. the GPU id, train.py:23),
SPMD via mesh config instead of DDP, bf16 via the precision policy instead
of AMP.

Usage:
  python train.py                          # full config, data from config
  python train.py --set model.d_model=256  # any config override
  python train.py --smoke                  # 2-step synthetic-data smoke run
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from mocov2_whisper_flamingo_tpu.config import add_config_flags, config_from_args
from mocov2_whisper_flamingo_tpu.utils.logging_utils import setup_logging

logger = logging.getLogger("train")


def build_net(config, vocab_size: int):
    import jax

    from mocov2_whisper_flamingo_tpu.models import layers as L
    from mocov2_whisper_flamingo_tpu.models.av_net import AVNet

    model_args = (
        config["model"]["d_model"],
        config["model"]["n_heads"],
        config["model"]["n_layers"],
        config["model"]["pe_max_len"],
        config["model"]["fc_hidden_size"],
        config["model"]["dropout"],
    )
    precision = (L.BF16 if config["precision"]["compute_dtype"] == "bfloat16" else L.FP32)
    net = AVNet(
        modal=config["data"]["modality"],
        MoCofile=config["data"]["moco_file"],
        reqInpLen=config["model"]["required_input_length"],
        modelargs=model_args,
        vocab_size=vocab_size,
        enable_logging=config["output"]["enable_logging"],
        whisper_name=config["whisper"]["model_name"],
        precision=precision,
        remat=bool(config["precision"].get("rematerialize", False)),
    )
    params = net.init(jax.random.PRNGKey(config["training"].get("seed", 0)))
    return net, params


class _SmokeDataModule:
    """Synthetic in-memory data for --smoke (no dataset needed)."""

    def __init__(self, tokenizer, n_batches=2, b=2, t_video=8):
        rng = np.random.default_rng(0)
        self.batches = []
        for i in range(n_batches):
            texts = [f"smoke test {j}" for j in range(b)]
            enc = [tokenizer.encode(t, max_length=16) for t in texts]
            max_l = max(len(e) for e in enc)
            ids = np.zeros((b, max_l), np.int64)
            lens = np.zeros((b,), np.int32)
            for j, e in enumerate(enc):
                ids[j, : len(e)] = e
                lens[j] = len(e)
            self.batches.append({
                "audio": rng.standard_normal((b, 3000, 80)).astype(np.float32),
                "audio_mask": np.ones((b, 3000), bool),
                "audio_lengths": np.full((b,), 64, np.int32),
                "video": rng.standard_normal((b, t_video, 3, 64, 64)).astype(np.float32),
                "video_mask": np.ones((b, t_video), bool),
                "video_lengths": np.full((b,), t_video, np.int32),
                "target_ids": ids,
                "target_lengths": lens,
                "target_text": texts,
            })

    class _L(list):
        def set_epoch(self, e):
            pass

    def train_dataloader(self):
        return self._L(self.batches)

    def val_dataloader(self):
        return self._L(self.batches[:1])

    def test_dataloader(self):
        return self._L(self.batches[:1])


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_flags(parser)
    parser.add_argument("--smoke", action="store_true",
                        help="2-step synthetic run (sanity check)")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint path to resume from ('last' for the last one)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler device trace of the run into DIR")
    args = parser.parse_args()

    config = config_from_args(args)
    setup_logging()

    from mocov2_whisper_flamingo_tpu.training.trainer import Trainer
    from mocov2_whisper_flamingo_tpu.utils.tokenizer import load_tokenizer

    if args.smoke:
        config.set_dotted("training.epochs", 1)
        config.set_dotted("training.accumulate_grad_batches", 1)
        config.set_dotted("output.log_every_n_steps", 1)
        config.set_dotted("mesh.model", 1)
        # shrink the model so the smoke run compiles fast
        config.set_dotted("whisper.model_name", "whisper-tiny")
        config.set_dotted("model.d_model", 64)
        config.set_dotted("model.n_heads", 4)
        config.set_dotted("model.fc_hidden_size", 128)
        tokenizer = load_tokenizer(None)
        datamodule = _SmokeDataModule(tokenizer)
        vocab_size = len(tokenizer)
    else:
        from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataModule

        datamodule = DataModule(config)
        datamodule.setup()
        tokenizer = datamodule.tokenizer
        vocab_size = datamodule.vocab_size

    logger.info("vocab size = %d", vocab_size)
    net, params = build_net(config, vocab_size)
    trainer = Trainer(config, net, tokenizer)

    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        from mocov2_whisper_flamingo_tpu.utils.profiling import trace

        profile_ctx = trace(args.profile)

    logger.info("starting training...")
    with profile_ctx:
        params = trainer.fit(
            datamodule, params,
            max_steps=args.max_steps or (2 if args.smoke else None),
            resume=args.resume)

    logger.info("starting testing...")
    metrics = trainer.test(datamodule, params)
    logger.info("test metrics: %s", metrics)
    logger.info("training and testing completed")


if __name__ == "__main__":
    main()
