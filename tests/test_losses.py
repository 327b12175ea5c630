"""CTC and label-smoothed CE parity vs torch CPU oracles
(reference uses nn.CTCLoss / nn.CrossEntropyLoss at train.py:85-93)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.ops.losses import ctc_loss, label_smoothed_cross_entropy

torch = pytest.importorskip("torch")


def _ctc_case(rng, b=3, t=50, v=20, lmax=12):
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = rng.integers(1, v, size=(b, lmax)).astype(np.int32)
    input_lengths = rng.integers(lmax * 2 + 2, t + 1, size=(b,)).astype(np.int32)
    label_lengths = rng.integers(1, lmax + 1, size=(b,)).astype(np.int32)
    return logits, labels, input_lengths, label_lengths


@pytest.mark.parametrize("reduction", ["mean", "none", "sum"])
def test_ctc_matches_torch(rng, reduction):
    logits, labels, input_lengths, label_lengths = _ctc_case(rng)

    tl = torch.from_numpy(logits)
    log_probs = torch.nn.functional.log_softmax(tl, dim=-1).transpose(0, 1)
    ref = torch.nn.CTCLoss(blank=0, reduction=reduction, zero_infinity=True)(
        log_probs,
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(input_lengths.astype(np.int64)),
        torch.from_numpy(label_lengths.astype(np.int64)),
    ).numpy()

    ours = np.asarray(
        ctc_loss(
            jnp.asarray(logits), jnp.asarray(labels),
            jnp.asarray(input_lengths), jnp.asarray(label_lengths),
            reduction=reduction,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_ctc_degenerate_zero_infinity(rng):
    """Input shorter than needed for the target -> torch gives inf, and
    zero_infinity clamps to 0."""
    logits = rng.standard_normal((2, 10, 20)).astype(np.float32)
    labels = rng.integers(1, 20, size=(2, 9)).astype(np.int32)
    input_lengths = np.array([2, 10], dtype=np.int32)
    label_lengths = np.array([9, 3], dtype=np.int32)
    # Force repeated labels so collapsed length needs ~2L-1 > 2 frames.
    labels[0] = 5

    ours = np.asarray(
        ctc_loss(
            jnp.asarray(logits), jnp.asarray(labels),
            jnp.asarray(input_lengths), jnp.asarray(label_lengths),
            reduction="none",
        )
    )
    assert ours[0] == 0.0  # clamped
    assert np.isfinite(ours[1]) and ours[1] > 0


def test_ctc_grad_is_finite(rng):
    import jax

    logits, labels, input_lengths, label_lengths = _ctc_case(rng, b=2, t=30, v=10, lmax=6)
    g = jax.grad(
        lambda lg: ctc_loss(
            lg, jnp.asarray(labels), jnp.asarray(input_lengths), jnp.asarray(label_lengths)
        )
    )(jnp.asarray(logits))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_label_smoothed_ce_matches_torch(rng, smoothing):
    b, t, v = 4, 17, 31
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    targets = rng.integers(0, v, size=(b, t)).astype(np.int64)
    targets[0, :5] = -100  # ignored positions
    targets[2, -3:] = -100

    ref = torch.nn.CrossEntropyLoss(ignore_index=-100, label_smoothing=smoothing)(
        torch.from_numpy(logits).reshape(-1, v), torch.from_numpy(targets).reshape(-1)
    ).numpy()

    ours = np.asarray(
        label_smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), label_smoothing=smoothing
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_label_smoothed_ce_all_ignored():
    logits = jnp.zeros((2, 3, 5))
    targets = jnp.full((2, 3), -100)
    out = label_smoothed_cross_entropy(logits, targets)
    assert float(out) == 0.0
