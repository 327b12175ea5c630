"""Mesh and sharding-rule tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from mocov2_whisper_flamingo_tpu.parallel import (
    make_mesh, param_sharding, batch_sharding, shard_params, shard_batch)


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_all = make_mesh(n_data=-1, n_model=2)
    assert mesh_all.shape["data"] * 2 == len(jax.devices())
    with pytest.raises(ValueError):
        make_mesh(n_data=-1, n_model=3)  # 8 % 3 != 0


def test_param_rules_tp_layout():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "whisper_encoder": {
            "layers": [{
                "self_attn": {"q": {"kernel": jnp.zeros((64, 64))},
                              "out": {"kernel": jnp.zeros((64, 64))}},
                "mlp": {"fc1": {"kernel": jnp.zeros((64, 256))},
                        "fc2": {"kernel": jnp.zeros((256, 64))}},
            }],
        },
        "audio_ln": {"scale": jnp.zeros((64,))},
        "decoder": {"kernel": jnp.zeros((64, 51866))},
        "odd": {"kernel": jnp.zeros((7, 13))},  # not divisible -> replicate
    }
    sh = param_sharding(mesh, params)
    layer = sh["whisper_encoder"]["layers"][0]
    assert layer["self_attn"]["q"]["kernel"].spec == P(None, "model")   # column
    assert layer["self_attn"]["out"]["kernel"].spec == P("model", None)  # row
    assert layer["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert layer["mlp"]["fc2"]["kernel"].spec == P("model", None)
    assert sh["audio_ln"]["scale"].spec == P()        # replicated
    assert sh["decoder"]["kernel"].spec == P(None, "model")  # vocab sharded
    assert sh["odd"]["kernel"].spec == P()            # indivisible -> replicated


def test_sharded_matmul_matches_single_device(rng):
    """A TP matmul under shardings must equal the unsharded result (XLA
    inserts the collectives)."""
    mesh = make_mesh(n_data=4, n_model=2)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    w1 = rng.standard_normal((64, 128)).astype(np.float32)
    w2 = rng.standard_normal((128, 64)).astype(np.float32)

    params = {"mlp": {"fc1": {"kernel": jnp.asarray(w1)}, "fc2": {"kernel": jnp.asarray(w2)}}}
    p_sharded = shard_params(mesh, params)
    batch = shard_batch(mesh, {"x": jnp.asarray(x)})

    def f(p, b):
        h = jnp.maximum(b["x"] @ p["mlp"]["fc1"]["kernel"], 0)
        return h @ p["mlp"]["fc2"]["kernel"]

    out = jax.jit(f)(p_sharded, batch)
    ref = np.maximum(x @ w1, 0) @ w2
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-4)


def test_batch_sharding_leading_axis():
    mesh = make_mesh(n_data=4, n_model=2)
    batch = {"audio": jnp.zeros((8, 10)), "scalar_len": jnp.zeros((3,))}
    sh = batch_sharding(mesh, batch)
    assert sh["audio"].spec == P("data")
    assert sh["scalar_len"].spec == P()  # 3 % 4 != 0 -> replicated


def test_beam_search_data_parallel(rng):
    """BASELINE config 4 shape: batched beam decode with the batch sharded
    over the data axis of an 8-device mesh — XLA partitions the whole search."""
    import jax.numpy as jnp

    from mocov2_whisper_flamingo_tpu.decode import beam_search
    from mocov2_whisper_flamingo_tpu.models.whisper import WhisperConfig, WhisperDecoder

    cfg = WhisperConfig(n_mels=80, d_model=32, encoder_layers=1, decoder_layers=1,
                        n_heads=4, d_ff=64, vocab_size=40,
                        max_source_positions=16, max_target_positions=16)
    dec = WhisperDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=8, n_model=1)
    enc_out = jnp.asarray(rng.standard_normal((8, 16, 32)).astype(np.float32))
    enc_sharded = jax.device_put(enc_out, jax.NamedSharding(mesh, P("data")))
    p_repl = jax.device_put(params, jax.NamedSharding(mesh, P()))

    f = jax.jit(lambda p, e: beam_search(dec, p, e, [1, 2], beam_size=3,
                                         max_len=10, eos_id=3).sequences)
    sharded = np.asarray(f(p_repl, enc_sharded))
    single = np.asarray(f(params, enc_out))
    np.testing.assert_array_equal(sharded, single)


def test_per_host_batch_sharding_rejects_indivisible():
    """per_host=True must RAISE on a batch dim that doesn't divide this
    host's data-axis share — silently replicating host-local rows feeds
    different data per host (round-2 advisor finding)."""
    import numpy as np
    import pytest

    mesh = make_mesh()
    good = {"x": np.zeros((mesh.shape["data"], 3))}
    sh = batch_sharding(mesh, good, per_host=True)
    assert sh["x"].spec == jax.sharding.PartitionSpec("data")
    with pytest.raises(ValueError, match="does not divide"):
        batch_sharding(mesh, {"x": np.zeros((3, 2))}, per_host=True)


def test_beam_search_tensor_parallel(rng):
    """Serving-style TP: decoder weights sharded over the model axis
    (Megatron column/row rules) on a dp=4 x tp=2 mesh — beam decode must
    reproduce the single-device tokens (psum partial-sum order shifts
    logits by float noise well under the toy decoder's logit gaps)."""
    import jax.numpy as jnp

    from mocov2_whisper_flamingo_tpu.decode import beam_search
    from mocov2_whisper_flamingo_tpu.models.whisper import (
        WhisperConfig, WhisperDecoder)
    from mocov2_whisper_flamingo_tpu.parallel.mesh import param_sharding

    cfg = WhisperConfig(n_mels=80, d_model=32, encoder_layers=1,
                        decoder_layers=2, n_heads=4, d_ff=64, vocab_size=40,
                        max_source_positions=16, max_target_positions=16)
    dec = WhisperDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=4, n_model=2)
    enc_out = jnp.asarray(rng.standard_normal((4, 16, 32)).astype(np.float32))
    enc_sharded = jax.device_put(enc_out, jax.NamedSharding(mesh, P("data")))
    p_tp = jax.device_put(params, param_sharding(mesh, params))
    # the TP rules must actually shard something on the model axis
    shardings = jax.tree.leaves(param_sharding(mesh, params))
    assert any("model" in str(s.spec) for s in shardings)

    f = jax.jit(lambda p, e: beam_search(dec, p, e, [1, 2], beam_size=3,
                                         max_len=10, eos_id=3).sequences)
    with mesh:
        sharded = np.asarray(f(p_tp, enc_sharded))
    single = np.asarray(f(params, enc_out))
    np.testing.assert_array_equal(sharded, single)
