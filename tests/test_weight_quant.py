"""Weight-only int8 decode quantization (w8a16).

The decode step re-reads every decode-path weight from HBM per token; at
medium/large Whisper sizes that traffic bounds the step, so
``prepare_decode_params(weight_quant="int8")`` stores the decode-hot
kernels + the tied embedding table as int8 with per-output-channel /
per-row f32 scales folded into the matmul outputs (exact scale algebra —
the only error is the int8 rounding of the weights)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.decode import beam_search, greedy_decode
from mocov2_whisper_flamingo_tpu.models import layers as L
from mocov2_whisper_flamingo_tpu.models.whisper import (
    WhisperConfig, WhisperDecoder)

CFG = WhisperConfig(
    n_mels=80, d_model=48, encoder_layers=1, decoder_layers=2, n_heads=4,
    d_ff=96, vocab_size=50, max_source_positions=16, max_target_positions=32,
)
EOS = 3
PREFIX = [1, 2]


@pytest.fixture(scope="module")
def setup():
    dec = WhisperDecoder(CFG)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal((2, 16, 48)).astype(np.float32))
    return dec, params, enc_out


def test_quantize_linear_error_bound():
    """Per-output-channel int8: worst-case elementwise weight error is half
    a quantization step (scale/2), and the linear output stays within ~1%
    relative error at random-weight scales."""
    key = jax.random.PRNGKey(1)
    p = L.linear_init(key, 64, 32)
    q = L.quantize_linear(p)
    assert q["kernel_q"].dtype == jnp.int8
    deq = q["kernel_q"].astype(jnp.float32) * q["scale"][None, :]
    step = np.asarray(q["scale"])
    err = np.abs(np.asarray(deq) - np.asarray(p["kernel"]))
    assert (err <= step[None, :] / 2 + 1e-7).all()

    x = jax.random.normal(jax.random.PRNGKey(2), (5, 64))
    y_fp = np.asarray(L.linear(p, x))
    y_q = np.asarray(L.linear(q, x))
    rel = np.abs(y_q - y_fp).max() / (np.abs(y_fp).max() + 1e-9)
    assert rel < 0.02


def test_quantize_embedding_lookup_and_tied_projection():
    p = L.embedding_init(jax.random.PRNGKey(3), 20, 16)
    q = L.quantize_embedding(p)
    # Lookup dequantizes per-row exactly: row * scale[row] reproduces the
    # quantized table's value, within half a step of the original.
    ids = jnp.asarray([0, 7, 19])
    rows_q = np.asarray(L.embed(q, ids))
    rows_fp = np.asarray(L.embed(p, ids))
    step = np.asarray(q["scale"])[np.asarray(ids)]
    assert (np.abs(rows_q - rows_fp) <= step[:, None] / 2 + 1e-7).all()


def test_prepare_decode_params_structure(setup):
    dec, params, _ = setup
    qp = dec.prepare_decode_params(params, weight_quant="int8")
    lp = qp["layers"][0]
    # decode-hot kernels are int8 with f32 scales
    for d in (lp["self_attn"]["qkv"], lp["self_attn"]["out"],
              lp["cross_attn"]["q"], lp["cross_attn"]["out"],
              lp["mlp"]["fc1"], lp["mlp"]["fc2"]):
        assert d["kernel_q"].dtype == jnp.int8
        assert d["scale"].dtype == jnp.float32
    assert qp["embed_tokens"]["embedding_q"].dtype == jnp.int8
    # weights the step does not read stay unquantized
    assert "kernel" in lp["self_attn"]["q"]
    assert "kernel" in lp["cross_attn"]["k"]
    with pytest.raises(ValueError):
        dec.prepare_decode_params(params, weight_quant="int4")


def test_quantized_decode_step_logits_close(setup):
    dec, params, enc_out = setup
    fp = dec.prepare_decode_params(params)
    qp = dec.prepare_decode_params(params, weight_quant="int8")
    cache_fp = dec.init_cache(fp, enc_out, max_len=8)
    cache_q = dec.init_cache(qp, enc_out, max_len=8)
    cur = jnp.asarray([[1], [2]], jnp.int32)
    logits_fp, _ = dec.decode_step(fp, cur, cache_fp, jnp.int32(0))
    logits_q, _ = dec.decode_step(qp, cur, cache_q, jnp.int32(0))
    a, b = np.asarray(logits_fp), np.asarray(logits_q)
    assert np.isfinite(b).all()
    # int8 weight rounding only: logits drift a small fraction of the
    # logit scale (random-init tiny model; real weights are smoother).
    assert np.abs(a - b).max() < 0.05 * np.abs(a).max() + 0.05


def test_quantized_teacher_forced_apply_close(setup):
    """decoder.apply stays valid on the quantized tree (DTW alignment
    path): quantized cross/MLP/embedding dequantize in-graph."""
    dec, params, enc_out = setup
    qp = dec.prepare_decode_params(params, weight_quant="int8")
    toks = jnp.asarray([[1, 2, 4, 5], [1, 2, 6, 7]], jnp.int32)
    lf = np.asarray(dec.apply(params, toks, enc_out))
    lq = np.asarray(dec.apply(qp, toks, enc_out))
    assert lq.shape == lf.shape
    assert np.isfinite(lq).all()
    assert np.abs(lf - lq).max() < 0.05 * np.abs(lf).max() + 0.05


def test_quantized_beam_matches_fp_tokens(setup):
    """With this fixed seed the tiny model's beam search is stable under
    the ~0.5% quantized-logit perturbation — tokens and scores match the
    fp path (deterministic environment; a score tolerance guards the
    assertion's intent)."""
    dec, params, enc_out = setup
    fp = dec.prepare_decode_params(params)
    qp = dec.prepare_decode_params(params, weight_quant="int8")
    r_fp = beam_search(dec, fp, enc_out, PREFIX, beam_size=3, max_len=12, eos_id=EOS)
    r_q = beam_search(dec, qp, enc_out, PREFIX, beam_size=3, max_len=12, eos_id=EOS)
    np.testing.assert_allclose(np.asarray(r_q.scores), np.asarray(r_fp.scores),
                               atol=0.05)
    np.testing.assert_array_equal(np.asarray(r_q.sequences[:, 0]),
                                  np.asarray(r_fp.sequences[:, 0]))


def test_quantized_greedy_jit(setup):
    dec, params, enc_out = setup
    qp = dec.prepare_decode_params(params, weight_quant="int8")
    f = jax.jit(lambda p, e: greedy_decode(dec, p, e, PREFIX, 12, EOS))
    toks = np.asarray(f(qp, enc_out))
    assert toks.shape == (2, 12)
    assert (toks[:, : len(PREFIX)] == np.asarray(PREFIX)).all()


def test_quantized_beam_with_int8_cache(setup):
    """weight_quant composes with cache_quant (both HBM levers at once)."""
    dec, params, enc_out = setup
    qp = dec.prepare_decode_params(params, weight_quant="int8")
    fp = dec.prepare_decode_params(params)
    r_q = beam_search(dec, qp, enc_out, PREFIX, beam_size=3, max_len=12,
                      eos_id=EOS, cache_quant="int8-cross")
    r_fp = beam_search(dec, fp, enc_out, PREFIX, beam_size=3, max_len=12, eos_id=EOS)
    np.testing.assert_allclose(np.asarray(r_q.scores), np.asarray(r_fp.scores),
                               atol=0.08)


def test_quantized_streaming_matches_fp_tokens(setup):
    """The streaming chunk program accepts the w8a16 tree (bench wires
    ``--weight-quant int8`` through the config-5 streaming leg): committed
    tokens match the fp stream at this fixed seed, and the quantized tree's
    cross k/v (left unquantized by design) feed _cross_caches unchanged."""
    from mocov2_whisper_flamingo_tpu.decode.streaming import StreamingDecoder

    dec, params, enc_out = setup
    rng = np.random.default_rng(2)
    chunks = [enc_out[:1],
              jnp.asarray(rng.standard_normal((1, 16, 48)).astype(np.float32))]
    outs = {}
    for name, wq in (("fp", None), ("q", "int8")):
        sd = StreamingDecoder(
            dec, dec.prepare_decode_params(params, weight_quant=wq),
            PREFIX, max_len=32, eos_id=EOS, max_tokens_per_chunk=5)
        toks = []
        for c in chunks:
            toks.extend(sd.process_chunk(c))
        outs[name] = toks
    # int8 weight rounding can legally flip near-tie argmaxes on this
    # random-init tiny model, so require strong positional agreement rather
    # than bit-equality (exact today with this pinned seed, but the pin
    # should not make platform/jax numeric shifts a test failure).
    assert len(outs["q"]) > 0 and len(outs["fp"]) > 0
    agree = sum(a == b for a, b in zip(outs["q"], outs["fp"]))
    assert agree >= 0.8 * max(len(outs["q"]), len(outs["fp"]))


def test_av_whisper_beam_weight_quant():
    from mocov2_whisper_flamingo_tpu.models.av_whisper import AVWhisperNet
    from mocov2_whisper_flamingo_tpu.models.whisper import WhisperEncoder

    vocab = 64
    tiny = WhisperConfig(n_mels=80, d_model=32, encoder_layers=1,
                         decoder_layers=1, n_heads=4, d_ff=64,
                         vocab_size=vocab, max_source_positions=64,
                         max_target_positions=32)
    net = AVWhisperNet(modelargs=(32, 4, 2, 3000, 128, 0.0), vocab_size=vocab,
                       whisper_name="whisper-tiny", backend="xla")
    net.whisper_config = tiny
    net.trunk.whisper_config = tiny
    net.trunk.whisper_encoder = WhisperEncoder(tiny, net.trunk.precision, "xla")
    net.decoder = WhisperDecoder(tiny, net.precision, "xla")
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((2, 80, 128)), jnp.float32),
        jnp.ones((2, 128), bool),
        jnp.asarray(rng.standard_normal((2, 6, 3, 32, 32)), jnp.float32),
        jnp.ones((2, 6), bool),
        jnp.asarray([6, 4], jnp.int32),
    )
    r_fp = net.beam(params, batch, PREFIX, beam_size=3, max_len=10, eos_id=EOS)
    r_q = net.beam(params, batch, PREFIX, beam_size=3, max_len=10, eos_id=EOS,
                   weight_quant="int8")
    assert r_q.sequences.shape == r_fp.sequences.shape
    np.testing.assert_allclose(np.asarray(r_q.scores), np.asarray(r_fp.scores),
                               atol=0.08)


def test_frozen_encoder_int8_train_step():
    """w8a16 on the FROZEN whisper-encoder kernels inside the train step
    (round-3 verdict, next #6): the quantized-tree step runs, produces a
    loss close to the fp32 step, updates trainable leaves, and leaves the
    int8 frozen leaves bit-unchanged."""
    import sys

    sys.path.insert(0, "tests")
    import test_training as tt
    from mocov2_whisper_flamingo_tpu.training.optim import (
        make_optimizer, trainable_mask_for)
    from mocov2_whisper_flamingo_tpu.training.task import AVSRTask

    net = tt._tiny_net()
    dm = tt.SyntheticDataModule(n_batches=1)
    batch = {k: jnp.asarray(v) for k, v in dm.batches[0].items()
             if not isinstance(v, (list, str))}
    params = net.init(jax.random.PRNGKey(0))
    params_q = net.quantize_frozen_params(params)
    enc_q = params_q["whisper_encoder"]["layers"][0]
    assert enc_q["self_attn"]["q"]["kernel_q"].dtype == jnp.int8
    assert enc_q["mlp"]["fc1"]["kernel_q"].dtype == jnp.int8
    # conv stem deliberately unquantized (different lowering; CLAUDE.md)
    assert "kernel" in params_q["whisper_encoder"]["conv1"]

    def one_step(p):
        mask = trainable_mask_for(net, p)
        opt, _ = make_optimizer(
            {"max_lr": 1e-3, "accumulate_grad_batches": 1}, 5, mask)
        st = opt.init(p)
        step = jax.jit(AVSRTask(net).make_train_step(opt))
        return step(p, st, batch, jax.random.PRNGKey(1))

    new_fp, _, losses_fp = one_step(params)
    new_q, _, losses_q = one_step(params_q)
    # int8 weight rounding perturbs the frozen encoder's features only
    # slightly: losses stay close
    assert abs(float(losses_q["loss"]) - float(losses_fp["loss"])) < 0.1, (
        float(losses_q["loss"]), float(losses_fp["loss"]))
    # trainable leaves moved identically-shaped; frozen int8 leaves froze
    assert float(jnp.abs(new_q["decoder"]["kernel"]
                         - params_q["decoder"]["kernel"]).max()) > 0
    np.testing.assert_array_equal(
        np.asarray(new_q["whisper_encoder"]["layers"][0]["self_attn"]["q"]["kernel_q"]),
        np.asarray(enc_q["self_attn"]["q"]["kernel_q"]))
    np.testing.assert_array_equal(
        np.asarray(new_q["whisper_encoder"]["layers"][0]["self_attn"]["q"]["scale"]),
        np.asarray(enc_q["self_attn"]["q"]["scale"]))


def test_trainer_frozen_weight_quant_knob(tmp_path):
    """training.frozen_weight_quant="int8" quantizes the frozen encoder at
    setup and the full fit loop runs on the quantized tree."""
    import sys

    sys.path.insert(0, "tests")
    import test_training as tt
    from mocov2_whisper_flamingo_tpu.config import get_config
    from mocov2_whisper_flamingo_tpu.training.trainer import Trainer
    from mocov2_whisper_flamingo_tpu.utils.tokenizer import ByteTokenizer

    cfg = get_config({
        "training.epochs": 1,
        "training.accumulate_grad_batches": 1,
        "training.frozen_weight_quant": "int8",
        "output.checkpoint_dir": str(tmp_path / "ckpt"),
        "output.log_dir": str(tmp_path / "logs"),
        "mesh.data": 4,
        "mesh.model": 1,
    })
    net = tt._tiny_net()
    trainer = Trainer(cfg, net, ByteTokenizer())
    params = net.init(jax.random.PRNGKey(0))
    params = trainer.fit(SyntheticDataModule_:= tt.SyntheticDataModule(
        n_batches=2), params)
    assert params["whisper_encoder"]["layers"][0]["self_attn"]["q"][
        "kernel_q"].dtype == jnp.int8
    metrics = trainer.validate(SyntheticDataModule_, params)
    assert np.isfinite(metrics["loss"])
