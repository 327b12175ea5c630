#!/usr/bin/env python
"""Batched evaluation: dataset -> decode -> WER report (+ predictions dump).

The eval capability of the reference's validation/test steps
(reference: train.py:172-216 — greedy argmax + jiwer WER over the
length-bucketed loader) as a standalone CLI, extended with the seq2seq
decode modes the north star adds:

- ``--mode ctc-greedy``: per-frame argmax over AVNet's linear head
  (reference-parity decode);
- ``--mode beam``: KV-cached beam search through the Whisper decoder
  (AVWhisperNet), ``--beam-size`` beams.

Runs data-parallel over all local devices (BASELINE config 4's v5e-8 eval
shape): params are replicated over a pure-data mesh and each batch's
leading axis is sharded across it, so the jitted forward/beam runs SPMD
with XLA inserting the collectives. Batches whose size doesn't divide the
device count (tail pieces from the quantized sampler) fall back to
replicated execution — correct, just not parallel — so no sample is ever
dropped or padded.
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

logger = logging.getLogger("evaluate")


def _mesh_runner():
    """(place_params, place_batch) over a pure-DP mesh spanning all
    devices — the same placement path the Trainer uses
    (parallel/mesh.py ``put_host_local_batch``, multi-host correct)."""
    import jax

    from mocov2_whisper_flamingo_tpu.parallel.mesh import (
        make_mesh, put_host_local_batch, replicated)

    mesh = make_mesh()

    def place_params(params):
        return jax.tree.map(jax.device_put, params, replicated(mesh, params))

    return place_params, lambda batch: put_host_local_batch(mesh, batch)


def evaluate_ctc_greedy(net, params, datamodule, tokenizer, split="test") -> dict:
    import jax
    import jax.numpy as jnp

    from mocov2_whisper_flamingo_tpu.utils.wer import wer as corpus_wer

    loader = (datamodule.test_dataloader() if split == "test"
              else datamodule.val_dataloader())
    place_params, place_batch = _mesh_runner()
    params = place_params(params)

    @jax.jit
    def predict(params, batch):
        logits = net.forward(params, (batch["audio"], batch["audio_mask"],
                                      batch["video"], batch["video_mask"],
                                      batch["video_lengths"]))
        return jnp.argmax(logits, axis=-1)

    refs, hyps = [], []
    for batch in loader:
        texts = batch.pop("target_text")
        arrays = place_batch({k: v for k, v in batch.items() if v is not None})
        preds = predict(params, arrays)
        hyps.extend(tokenizer.batch_decode(np.asarray(preds), skip_special_tokens=True))
        refs.extend(texts)
    return {"wer": corpus_wer(refs, hyps), "n": len(refs), "refs": refs, "hyps": hyps}


def evaluate_beam(net, params, datamodule, tokenizer, beam_size=5,
                  max_len=224, split="test", logit_rules=None) -> dict:
    import jax

    from mocov2_whisper_flamingo_tpu.utils.wer import wer as corpus_wer

    loader = (datamodule.test_dataloader() if split == "test"
              else datamodule.val_dataloader())
    prefix = tokenizer.prefix_token_ids
    eos = tokenizer.eos_token_id
    place_params, place_batch = _mesh_runner()
    params = place_params(params)

    @jax.jit
    def predict(params, batch):
        return net.beam(params, (batch["audio"], batch["audio_mask"],
                                 batch["video"], batch["video_mask"],
                                 batch["video_lengths"]),
                        prefix, beam_size=beam_size, max_len=max_len,
                        eos_id=eos, logit_rules=logit_rules).sequences[:, 0]

    refs, hyps = [], []
    for batch in loader:
        texts = batch.pop("target_text")
        arrays = place_batch({k: v for k, v in batch.items() if v is not None})
        preds = predict(params, arrays)
        hyps.extend(tokenizer.batch_decode(np.asarray(preds), skip_special_tokens=True))
        refs.extend(texts)
    return {"wer": corpus_wer(refs, hyps), "n": len(refs), "refs": refs, "hyps": hyps}


def restore_params(checkpoint_path: str, params):
    """Load model params from any checkpoint this framework writes.

    Trainer.fit saves ``{params, opt_state, step}`` (training/trainer.py) and
    convert_checkpoint saves bare param trees — restore layout-agnostically
    (no target), keep the params subtree, and cast onto the model's dtypes.
    """
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(checkpoint_path))
    tree = restored.get("params", restored) if isinstance(restored, dict) else restored
    return jax.tree.map(lambda t, x: jnp.asarray(x, t.dtype), params, tree)


def write_predictions(report: dict, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for pred, ref in zip(report["hyps"], report["refs"]):
            f.write(f"Pred: {pred}\nTarget: {ref}\n")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    from mocov2_whisper_flamingo_tpu.config import add_config_flags, config_from_args

    add_config_flags(parser)
    parser.add_argument("--mode", choices=["ctc-greedy", "beam"], default="ctc-greedy")
    parser.add_argument("--split", choices=["val", "test"], default="test")
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--predictions-out", default=None)
    parser.add_argument(
        "--generation-config", default=None,
        help="path to an HF generation_config.json: applies its "
             "suppress_tokens / begin_suppress_tokens / forced ids during "
             "beam decode (real-weight Whisper decode semantics)")
    parser.add_argument("--timestamps", action="store_true",
                        help="enable the Whisper timestamp grammar "
                             "(requires --generation-config)")
    args = parser.parse_args()
    config = config_from_args(args)
    logging.basicConfig(level=logging.INFO)

    import jax

    from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataModule
    from train import build_net

    datamodule = DataModule(config)
    datamodule.setup()
    tokenizer = datamodule.tokenizer

    if args.mode == "ctc-greedy":
        net, params = build_net(config, datamodule.vocab_size)
    else:
        from mocov2_whisper_flamingo_tpu.models import layers as L
        from mocov2_whisper_flamingo_tpu.models.av_whisper import AVWhisperNet

        net = AVWhisperNet(
            modelargs=(config["model"]["d_model"], config["model"]["n_heads"],
                       config["model"]["n_layers"], config["model"]["pe_max_len"],
                       config["model"]["fc_hidden_size"], config["model"]["dropout"]),
            vocab_size=datamodule.vocab_size,
            whisper_name=config["whisper"]["model_name"],
            precision=L.BF16 if config["precision"]["compute_dtype"] == "bfloat16" else L.FP32)
        params = net.init(jax.random.PRNGKey(0))

    if args.checkpoint:
        params = restore_params(args.checkpoint, params)

    if args.mode == "ctc-greedy":
        report = evaluate_ctc_greedy(net, params, datamodule, tokenizer, args.split)
    else:
        rules = None
        if args.generation_config:
            from mocov2_whisper_flamingo_tpu.decode import LogitRules

            with open(args.generation_config, encoding="utf-8") as f:
                rules = LogitRules.for_whisper(
                    json.load(f), vocab_size=datamodule.vocab_size,
                    timestamps=args.timestamps)
        report = evaluate_beam(net, params, datamodule, tokenizer,
                               args.beam_size, split=args.split,
                               logit_rules=rules)

    if args.predictions_out:
        write_predictions(report, args.predictions_out)
    print(json.dumps({"mode": args.mode, "split": args.split,
                      "wer": report["wer"], "n": report["n"]}))


if __name__ == "__main__":
    main()
