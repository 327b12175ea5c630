"""Gated cross-attention fusion: parity vs a torch implementation of the
reference block (nn.MultiheadAttention-based, reference:
gate_cross_attention.py:12-73) plus gate-at-init semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.models.fusion import GatedCrossModalFusion

torch = pytest.importorskip("torch")

D, H = 32, 4


def _torch_reference_block(d_model, n_heads):
    """The reference's gated block rebuilt in torch for an oracle."""

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = torch.nn.MultiheadAttention(d_model, n_heads, dropout=0.0,
                                                    batch_first=True)
            self.attn_ln = torch.nn.LayerNorm(d_model)
            self.ff_ln = torch.nn.LayerNorm(d_model)
            self.attn_gate = torch.nn.Parameter(torch.tensor([0.7]))
            self.ff_gate = torch.nn.Parameter(torch.tensor([-0.3]))
            self.ff = torch.nn.Sequential(
                torch.nn.Linear(d_model, d_model * 4), torch.nn.GELU(),
                torch.nn.Linear(d_model * 4, d_model))

        def forward(self, x, xa, key_padding_mask):
            a, _ = self.attn(self.attn_ln(x), xa, xa,
                             key_padding_mask=key_padding_mask, need_weights=False)
            x = x + a * self.attn_gate.tanh()
            x = x + self.ff(self.ff_ln(x)) * self.ff_gate.tanh()
            return x

    return Block().eval()


def _copy_block_to_jax(block, params_layer):
    """Map torch packed-QKV MultiheadAttention weights into our separate
    q/k/v params."""
    d = D
    w = block.attn.in_proj_weight.detach().numpy()
    b = block.attn.in_proj_bias.detach().numpy()
    params_layer["attn"]["q"] = {"kernel": jnp.asarray(w[:d].T), "bias": jnp.asarray(b[:d])}
    params_layer["attn"]["k"] = {"kernel": jnp.asarray(w[d:2*d].T), "bias": jnp.asarray(b[d:2*d])}
    params_layer["attn"]["v"] = {"kernel": jnp.asarray(w[2*d:].T), "bias": jnp.asarray(b[2*d:])}
    params_layer["attn"]["out"] = {
        "kernel": jnp.asarray(block.attn.out_proj.weight.detach().numpy().T),
        "bias": jnp.asarray(block.attn.out_proj.bias.detach().numpy()),
    }
    params_layer["attn_ln"] = {
        "scale": jnp.asarray(block.attn_ln.weight.detach().numpy()),
        "bias": jnp.asarray(block.attn_ln.bias.detach().numpy()),
    }
    params_layer["ff_ln"] = {
        "scale": jnp.asarray(block.ff_ln.weight.detach().numpy()),
        "bias": jnp.asarray(block.ff_ln.bias.detach().numpy()),
    }
    params_layer["ff1"] = {
        "kernel": jnp.asarray(block.ff[0].weight.detach().numpy().T),
        "bias": jnp.asarray(block.ff[0].bias.detach().numpy()),
    }
    params_layer["ff2"] = {
        "kernel": jnp.asarray(block.ff[2].weight.detach().numpy().T),
        "bias": jnp.asarray(block.ff[2].bias.detach().numpy()),
    }
    params_layer["attn_gate"] = jnp.asarray(0.7)
    params_layer["ff_gate"] = jnp.asarray(-0.3)
    return params_layer


def test_gated_block_parity_with_torch(rng):
    b, tq, tk = 2, 6, 9
    x = rng.standard_normal((b, tq, D)).astype(np.float32)
    xa = rng.standard_normal((b, tk, D)).astype(np.float32)
    pad_mask = np.zeros((b, tk), dtype=bool)
    pad_mask[1, 6:] = True  # torch convention: True = pad

    torch.manual_seed(1)
    block = _torch_reference_block(D, H)
    with torch.no_grad():
        ref = block(torch.from_numpy(x), torch.from_numpy(xa),
                    torch.from_numpy(pad_mask)).numpy()

    fusion = GatedCrossModalFusion(D, H, n_layers=1, dropout=0.0)
    params = fusion.init(jax.random.PRNGKey(0))
    # Make the input projections identity so we compare the block alone.
    params["audio_proj"] = {"kernel": jnp.eye(D), "bias": jnp.zeros(D)}
    params["video_proj"] = {"kernel": jnp.eye(D), "bias": jnp.zeros(D)}
    params["ln_post"] = {"scale": jnp.ones(D), "bias": jnp.zeros(D)}
    params["layers"][0] = _copy_block_to_jax(block, params["layers"][0])

    ours_pre_ln = None

    # ln_post is identity-initialized but still normalizes; compare pre-LN by
    # inverting: easier to just apply torch LN(=identity affine) to ref too.
    ours = np.asarray(
        fusion.apply(params, jnp.asarray(x), jnp.asarray(xa),
                     video_valid=jnp.asarray(~pad_mask)))
    ref_post = torch.nn.functional.layer_norm(torch.from_numpy(ref), (D,)).numpy()
    np.testing.assert_allclose(ours, ref_post, atol=2e-5, rtol=1e-4)


def test_zero_gates_make_fusion_passthrough(rng):
    """At init the gates are 0, so the fusion output must equal
    LN(audio_proj(audio)) regardless of the video stream — the Flamingo
    start-as-identity property."""
    fusion = GatedCrossModalFusion(D, H, n_layers=3, dropout=0.0)
    params = fusion.init(jax.random.PRNGKey(0))
    audio = jnp.asarray(rng.standard_normal((2, 5, D)).astype(np.float32))
    v1 = jnp.asarray(rng.standard_normal((2, 7, D)).astype(np.float32))
    v2 = jnp.asarray(rng.standard_normal((2, 7, D)).astype(np.float32))
    out1 = np.asarray(fusion.apply(params, audio, v1))
    out2 = np.asarray(fusion.apply(params, audio, v2))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_gate_reporting(rng):
    fusion = GatedCrossModalFusion(D, H, n_layers=2, dropout=0.0)
    params = fusion.init(jax.random.PRNGKey(0))
    audio = jnp.asarray(rng.standard_normal((1, 4, D)).astype(np.float32))
    video = jnp.asarray(rng.standard_normal((1, 4, D)).astype(np.float32))
    _, gates = fusion.apply(params, audio, video, return_gates=True)
    assert set(gates) == {"attn_gate_0", "ff_gate_0", "attn_gate_1", "ff_gate_1"}
    assert all(float(v) == 0.0 for v in gates.values())


def test_remat_matches_no_remat(rng):
    """jax.checkpoint rematerialization changes memory, not math: outputs and
    grads identical."""
    import jax

    x = jnp.asarray(rng.standard_normal((1, 5, D)).astype(np.float32))
    xa = jnp.asarray(rng.standard_normal((1, 7, D)).astype(np.float32))

    f_plain = GatedCrossModalFusion(D, H, n_layers=2, dropout=0.0)
    f_remat = GatedCrossModalFusion(D, H, n_layers=2, dropout=0.0, remat=True)
    params = f_plain.init(jax.random.PRNGKey(0))
    for layer in params["layers"]:
        layer["attn_gate"] = jnp.asarray(0.3)

    out1 = f_plain.apply(params, x, xa)
    out2 = f_remat.apply(params, x, xa)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    g1 = jax.grad(lambda p: jnp.sum(f_plain.apply(p, x, xa) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(f_remat.apply(p, x, xa) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_attention_prob_dropout_unbiased(rng):
    """Train-mode attention-prob dropout (reference:
    gate_cross_attention.py:16, dropout inside MHA) is an unbiased,
    non-degenerate estimator of eval attention: the mean over many masks
    converges to the eval output, and individual samples differ from it."""
    from mocov2_whisper_flamingo_tpu.ops.attention import multi_head_attention

    q = jnp.asarray(rng.standard_normal((1, 3, 2, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 6, 2, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 6, 2, 8)).astype(np.float32))
    base = np.asarray(multi_head_attention(q, k, v))

    p = 0.3
    f = jax.jit(lambda key: multi_head_attention(
        q, k, v, dropout_rate=p, dropout_rng=key))
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    samples = np.asarray(jax.vmap(f)(keys))
    assert np.abs(samples[0] - base).max() > 1e-3  # dropout actually fires
    np.testing.assert_allclose(samples.mean(0), base, atol=0.06)


def test_fusion_train_dropout_vs_eval(rng):
    """Fusion train-mode with dropout>0 differs from eval; with dropout=0 it
    matches eval exactly (rng plumbed but inert); the pallas-backend object
    silently falls back to XLA attention in train mode."""
    audio = jnp.asarray(rng.standard_normal((2, 5, D)).astype(np.float32))
    video = jnp.asarray(rng.standard_normal((2, 7, D)).astype(np.float32))

    fusion = GatedCrossModalFusion(D, H, n_layers=2, dropout=0.1)
    params = fusion.init(jax.random.PRNGKey(0))
    for layer in params["layers"]:  # open the gates so attention matters
        layer["attn_gate"] = jnp.asarray(0.5)
        layer["ff_gate"] = jnp.asarray(0.5)

    ev = np.asarray(fusion.apply(params, audio, video))
    tr = np.asarray(fusion.apply(params, audio, video, train=True,
                                 rng=jax.random.PRNGKey(7)))
    assert np.abs(tr - ev).max() > 1e-4

    fusion0 = GatedCrossModalFusion(D, H, n_layers=2, dropout=0.0)
    tr0 = np.asarray(fusion0.apply(params, audio, video, train=True,
                                   rng=jax.random.PRNGKey(7)))
    np.testing.assert_allclose(tr0, ev, atol=1e-6)

    fusion_p = GatedCrossModalFusion(D, H, n_layers=2, dropout=0.1,
                                     backend="pallas")
    tr_p = np.asarray(fusion_p.apply(params, audio, video, train=True,
                                     rng=jax.random.PRNGKey(7)))
    np.testing.assert_allclose(tr_p, tr, atol=1e-6)
