"""Shared model/batch builders for the multi-host train-step equivalence
test: the 2-process distributed run and the single-process reference must
construct bit-identical nets, params, optimizer, and global batch, so both
sides import from here (tests/test_multihost.py)."""

from __future__ import annotations

import numpy as np


def build_net():
    import jax.numpy as jnp

    from mocov2_whisper_flamingo_tpu.models.av_net import AVNet
    from mocov2_whisper_flamingo_tpu.models.whisper import (
        WhisperConfig, WhisperEncoder)

    vocab = 262
    tiny = WhisperConfig(
        n_mels=80, d_model=32, encoder_layers=1, decoder_layers=1, n_heads=4,
        d_ff=64, vocab_size=vocab, max_source_positions=512,
        max_target_positions=32)
    net = AVNet("audiovisual", None, 96, (32, 4, 2, 3000, 128, 0.0), vocab,
                backend="xla")
    net.whisper_config = tiny
    net.whisper_encoder = WhisperEncoder(tiny, net.precision, "xla")

    class _StubFrontend:
        OUT_DIM = 2048

        def init(self, key):
            import jax.random as jr

            return {"proj": jr.normal(key, (3, self.OUT_DIM)) * 0.02}

        def apply(self, params, video, x_len):
            pooled = jnp.mean(video, axis=(3, 4))
            feats = pooled @ params["proj"]
            valid = jnp.arange(video.shape[1])[None, :] < x_len[:, None]
            return jnp.where(valid[..., None], feats, 0.0)

    net.visual_frontend = _StubFrontend()
    return net


def make_global_batch(b: int = 4, t_mel: int = 64, t_video: int = 4,
                      l_target: int = 8) -> dict[str, np.ndarray]:
    """The full deterministic global batch (row r is identical no matter
    which host materializes it)."""
    rng = np.random.default_rng(1234)
    return {
        "audio": rng.standard_normal((b, 80, t_mel)).astype(np.float32),
        "audio_mask": np.ones((b, t_mel), bool),
        "audio_lengths": np.full((b,), l_target, np.int32),
        "video": rng.standard_normal((b, t_video, 3, 64, 64)).astype(np.float32),
        "video_mask": np.ones((b, t_video), bool),
        "video_lengths": np.full((b,), t_video, np.int32),
        "target_ids": rng.integers(6, 262, (b, l_target)).astype(np.int32),
        "target_lengths": np.full((b,), l_target, np.int32),
    }


def one_train_step(net, batch, mesh):
    """Same-seed params/optimizer -> one jitted AdamW train step on `batch`
    (a global array pytree sharded over `mesh`) -> updated params, forced to
    a REPLICATED out-sharding so every process can host-fetch them whole.
    Works identically single-controller and multi-controller: params are
    device_put replicated on the mesh (every process computes the same init
    from the same seed, which is exactly the identical-data contract
    multi-host device_put requires)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mocov2_whisper_flamingo_tpu.training.optim import (
        make_optimizer, trainable_mask_for)
    from mocov2_whisper_flamingo_tpu.training.task import AVSRTask

    rep = NamedSharding(mesh, P())
    params = net.init(jax.random.PRNGKey(0))
    mask = trainable_mask_for(net, params)
    opt, _ = make_optimizer(
        {"max_lr": 1e-3, "accumulate_grad_batches": 1}, 10, mask)
    opt_state = opt.init(params)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    key = jax.device_put(jax.random.PRNGKey(7), rep)
    step = jax.jit(AVSRTask(net).make_train_step(opt),
                   out_shardings=(rep, rep, rep))
    new_params, _, losses = step(params, opt_state, batch, key)
    return new_params, losses


def fetch_numpy(tree):
    """Host-fetch every leaf; leaves here are fully replicated global
    arrays, which every process may read whole."""
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)
