#!/usr/bin/env python
"""End-to-end walkthrough on synthetic data: dataset -> train -> evaluate ->
export -> beam decode. Runs anywhere (CPU or TPU) in a couple of minutes with
a tiny model; swap the config overrides for the full-size run.

    python examples/end_to_end.py [--workdir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import wave as wave_mod

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n_clips: int = 4) -> None:
    """Reference on-disk layout: {split}_{video,text}_seg12s with sibling
    wavs (reference: av_dataset.py:110-138)."""
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        vdir = os.path.join(root, split, f"{split}_video_seg12s", "spk")
        tdir = os.path.join(root, split, f"{split}_text_seg12s", "spk")
        os.makedirs(vdir, exist_ok=True)
        os.makedirs(tdir, exist_ok=True)
        for i in range(n_clips):
            frames = rng.integers(0, 255, (8 + 2 * i, 64, 64, 3), dtype=np.uint8)
            np.save(os.path.join(vdir, f"clip{i}.npy"), frames)
            t = np.arange(8000 + 2000 * i) / 16000
            x = 0.4 * np.sin(2 * np.pi * (300 + 50 * i) * t)
            with wave_mod.open(os.path.join(vdir, f"clip{i}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((x * 32767).astype("<i2").tobytes())
            with open(os.path.join(tdir, f"clip{i}.txt"), "w") as f:
                f.write(f"xin chao so {i}")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default=None)
    args = parser.parse_args()
    workdir = args.workdir or tempfile.mkdtemp(prefix="avsr_demo_")
    data_root = os.path.join(workdir, "data")
    make_dataset(data_root)
    print(f"[1/5] synthetic dataset at {data_root}")

    import jax

    from mocov2_whisper_flamingo_tpu.config import get_config
    from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataModule
    from mocov2_whisper_flamingo_tpu.training.trainer import Trainer
    from train import build_net

    config = get_config({
        "data.root_dir": data_root,
        "data.batch_size": 2,
        "data.max_frames": 16,
        "data.max_frames_val": 16,
        "training.epochs": 1,
        "training.accumulate_grad_batches": 1,
        "output.checkpoint_dir": os.path.join(workdir, "checkpoints"),
        "output.log_dir": os.path.join(workdir, "logs"),
        "output.log_every_n_steps": 1,
        "mesh.model": 1,
        # tiny model so the demo compiles fast
        "whisper.model_name": "whisper-tiny",
        "model.d_model": 64,
        "model.n_heads": 4,
        "model.fc_hidden_size": 128,
    })

    datamodule = DataModule(config)
    datamodule.setup()
    net, params = build_net(config, datamodule.vocab_size)
    trainer = Trainer(config, net, datamodule.tokenizer)
    print("[2/5] training 1 epoch...")
    params = trainer.fit(datamodule, params)

    print("[3/5] evaluating (reference-parity greedy decode)...")
    metrics = trainer.test(datamodule, params)
    print("      test metrics:", json.dumps(metrics))

    print("[4/5] exporting StableHLO + reload-verify...")
    import jax.numpy as jnp

    from mocov2_whisper_flamingo_tpu.tools.export_model import export_forward, verify_export

    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((1, 3000, 80)), jnp.float32),
        jnp.ones((1, 3000), bool),
        jnp.asarray(rng.standard_normal((1, 16, 3, 64, 64)), jnp.float32),
        jnp.ones((1, 16), bool),
        jnp.full((1,), 16, jnp.int32),
    )
    hlo_path = os.path.join(workdir, "avsr.stablehlo")
    export_forward(net, params, batch, hlo_path)
    # loose atol: TPU default-precision matmuls differ slightly between the
    # re-hydrated and live programs
    assert verify_export(hlo_path, params, batch,
                         reference_out=net.forward(params, batch), atol=0.1)
    print(f"      exported + verified {hlo_path}")

    print("[5/5] beam=3 decode through the Whisper decoder bridge...")
    from mocov2_whisper_flamingo_tpu.models import layers as L
    from mocov2_whisper_flamingo_tpu.models.av_whisper import AVWhisperNet
    from mocov2_whisper_flamingo_tpu.models.whisper import WhisperConfig, WhisperDecoder, WhisperEncoder

    tiny = WhisperConfig(n_mels=80, d_model=64, encoder_layers=2, decoder_layers=2,
                         n_heads=4, d_ff=128, vocab_size=datamodule.vocab_size,
                         max_source_positions=1500, max_target_positions=48)
    av = AVWhisperNet(modelargs=(64, 4, 2, 3000, 128, 0.0),
                      vocab_size=datamodule.vocab_size, whisper_name="whisper-tiny")
    av.whisper_config = tiny
    av.trunk.whisper_config = tiny
    av.trunk.whisper_encoder = WhisperEncoder(tiny, av.precision, av.trunk.backend)
    av.decoder = WhisperDecoder(tiny, av.precision, av.trunk.backend)
    av_params = av.init(jax.random.PRNGKey(0))
    tok = datamodule.tokenizer
    result = av.beam(av_params, batch, tok.prefix_token_ids, beam_size=3,
                     max_len=16, eos_id=tok.eos_token_id)
    texts = tok.batch_decode(np.asarray(result.sequences[:, 0]), skip_special_tokens=True)
    print("      beam hypotheses (random weights):", texts)
    print(f"DONE. artifacts in {workdir}")


if __name__ == "__main__":
    main()
