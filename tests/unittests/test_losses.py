import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.nnet.losses import (
    AdditiveAngularMargin,
    AngularMargin,
    LogSoftmaxWrapper,
    PitWrapper,
    bce_loss,
    cal_si_snr,
    classification_error,
    ctc_loss,
    get_si_snr_with_pitwrapper,
    kldiv_loss,
    l1_loss,
    mse_loss,
    nll_loss,
    transducer_loss,
)


def test_nll_perfect():
    lp = jnp.log(jnp.array([[[0.99, 0.01]], [[0.99, 0.01]]]))
    loss = nll_loss(lp, jnp.array([[0], [0]]))
    assert float(loss) < 0.02


def test_nll_masks_padding():
    # Second frame is padding with a terrible prediction; masked out.
    lp = jnp.log(
        jnp.array([[[0.9, 0.1], [0.001, 0.999]]])
    )
    loss_full = nll_loss(lp, jnp.array([[0, 0]]))
    loss_masked = nll_loss(lp, jnp.array([[0, 0]]), length=jnp.array([0.5]))
    assert float(loss_masked) < float(loss_full)
    assert float(loss_masked) == pytest.approx(-np.log(0.9), rel=1e-4)


def test_mse_l1():
    p = jnp.ones((2, 4, 3))
    t = jnp.zeros((2, 4, 3))
    assert float(mse_loss(p, t)) == pytest.approx(1.0)
    assert float(l1_loss(p, t)) == pytest.approx(1.0)


def test_bce():
    logits = jnp.array([[100.0], [-100.0]])
    targets = jnp.array([[1.0], [0.0]])
    assert float(bce_loss(logits, targets)) < 1e-4


def test_kldiv_label_smoothing():
    lp = jax.nn.log_softmax(jnp.zeros((1, 3, 5)))
    loss = kldiv_loss(lp, jnp.array([[1, 2, 3]]), label_smoothing=0.1)
    assert np.isfinite(float(loss))


def test_classification_error():
    probs = jnp.array([[[0.9, 0.1]], [[0.1, 0.9]]])
    err = classification_error(probs, jnp.array([[0], [0]]))
    assert float(err) == pytest.approx(0.5)


def test_ctc_loss_decreases_with_certainty():
    # A confident correct path should have lower loss than uniform.
    B, T, C = 1, 6, 4
    targets = jnp.array([[1, 2]])
    uniform = jax.nn.log_softmax(jnp.zeros((B, T, C)))
    loss_u = ctc_loss(uniform, targets, jnp.ones(B), jnp.ones(B), blank_index=0)
    logits = np.full((B, T, C), -5.0)
    path = [1, 1, 0, 2, 2, 0]
    for t, c in enumerate(path):
        logits[0, t, c] = 5.0
    loss_c = ctc_loss(
        jax.nn.log_softmax(jnp.asarray(logits)),
        targets, jnp.ones(B), jnp.ones(B), blank_index=0,
    )
    assert float(loss_c) < float(loss_u)


def test_ctc_loss_nonzero_blank_index():
    B, T, C = 2, 8, 5
    rng = np.random.default_rng(0)
    lp = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(B, T, C))))
    targets = jnp.asarray(rng.integers(0, C - 1, size=(B, 3)))
    l0 = ctc_loss(lp, targets, jnp.ones(B), jnp.ones(B), blank_index=C - 1)
    assert np.isfinite(float(l0))


def test_transducer_loss_runs():
    B, T, U, V = 2, 5, 3, 6
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, V, size=(B, U)))
    loss = transducer_loss(
        logits, targets, jnp.ones(B), jnp.ones(B), blank_index=0
    )
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda lg: transducer_loss(
            lg, targets, jnp.ones(B), jnp.ones(B), blank_index=0
        )
    )(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_si_snr_perfect():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(100, 2, 2)))
    snr = -cal_si_snr(x, x)  # reference layout (T, B, C); negated output
    assert float(snr.min()) > 50.0


def test_pit_finds_permutation():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(2, 50, 2)))
    swapped = a[..., ::-1]
    loss = get_si_snr_with_pitwrapper(a, swapped)
    assert float(loss.mean()) < -50.0  # negative SI-SNR, perfect after permuting


def test_angular_margin():
    am = AngularMargin(margin=0.2, scale=2.0)
    out = am(jnp.array([[0.9, 0.1]]), jnp.array([[1.0, 0.0]]))
    assert float(out[0, 0]) == pytest.approx(2 * (0.9 - 0.2))
    assert float(out[0, 1]) == pytest.approx(0.2)


def test_aam_loss_learns_direction():
    wrapper = LogSoftmaxWrapper(AdditiveAngularMargin(margin=0.2, scale=30))
    good = wrapper(jnp.array([[[0.95, -0.95]]]), jnp.array([[0]]))
    bad = wrapper(jnp.array([[[-0.95, 0.95]]]), jnp.array([[0]]))
    assert float(good) < float(bad)
