"""Pallas CTC lattice kernel: parity vs optax (interpret mode on CPU).

The kernel returns the exact lattice NLL (forward parity ~1e-6) and an
analytic VJP whose gradient matches optax's w.r.t. the PRE-SOFTMAX
logits (optax.ctc_loss differentiates through its internal log_softmax,
so gradients w.r.t. the intermediate log-probs legitimately differ by
the softmax Jacobian; composed through the model's own log_softmax the
two are identical).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speechbrain_tpu.ops.pallas import ctc as pc


def _optax_per_seq(lp, tg, tb, ub):
    B, T, _ = lp.shape
    U = tg.shape[1]
    logit_pad = jnp.asarray(
        (np.arange(T)[None, :] >= tb[:, None]).astype(np.float32)
    )
    label_pad = jnp.asarray(
        (np.arange(U)[None, :] >= ub[:, None]).astype(np.float32)
    )
    return optax.ctc_loss(lp, logit_pad, jnp.asarray(tg), label_pad, blank_id=0)


@pytest.mark.parametrize("B,T,C,U", [(8, 12, 7, 4), (8, 20, 11, 6)])
def test_forward_matches_optax(B, T, C, U):
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    lp = jax.nn.log_softmax(logits, -1)
    tg = rng.randint(1, C, size=(B, U)).astype(np.int32)
    tg[0, 1] = tg[0, 0]  # repeated label exercises the skip rule
    tb = rng.randint(max(2 * U, 3), T + 1, size=B).astype(np.int32)
    ub = rng.randint(1, U + 1, size=B).astype(np.int32)
    ref = np.asarray(_optax_per_seq(lp, tg, tb, ub))
    got = np.asarray(
        pc._ctc_pallas(
            lp, jnp.asarray(tg), (jnp.asarray(tb), jnp.asarray(ub)), 0, True
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_grad_matches_optax_wrt_logits():
    rng = np.random.RandomState(1)
    B, T, C, U = 8, 15, 9, 5
    logits = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    tg = rng.randint(1, C, size=(B, U)).astype(np.int32)
    tg[2, 3] = tg[2, 2]
    tb = rng.randint(2 * U, T + 1, size=B).astype(np.int32)
    ub = rng.randint(1, U + 1, size=B).astype(np.int32)
    gvec = jnp.asarray(rng.randn(B).astype(np.float32))

    def loss_ref(lg):
        return (_optax_per_seq(jax.nn.log_softmax(lg, -1), tg, tb, ub) * gvec).sum()

    def loss_pal(lg):
        per = pc._ctc_pallas(
            jax.nn.log_softmax(lg, -1),
            jnp.asarray(tg),
            (jnp.asarray(tb), jnp.asarray(ub)),
            0,
            True,
        )
        return (per * gvec).sum()

    gr = np.asarray(jax.grad(loss_ref)(logits))
    gp = np.asarray(jax.grad(loss_pal)(logits))
    np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-5)


def test_nonzero_blank_index():
    rng = np.random.RandomState(2)
    B, T, C, U = 8, 10, 6, 3
    blank = C - 1
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(B, T, C), jnp.float32), -1)
    tg = rng.randint(0, C - 1, size=(B, U)).astype(np.int32)
    tb = np.full(B, T, np.int32)
    ub = np.full(B, U, np.int32)
    got = np.asarray(
        pc._ctc_pallas(
            lp, jnp.asarray(tg), (jnp.asarray(tb), jnp.asarray(ub)),
            blank, True,
        )
    )
    # reference: permute blank to 0 and use optax
    perm = np.arange(C)
    perm[0], perm[blank] = blank, 0
    lp_p = np.asarray(lp)[..., perm]
    tg_p = np.where(tg == 0, blank, tg)
    ref = np.asarray(_optax_per_seq(jnp.asarray(lp_p), tg_p, tb, ub))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_wrapper_dispatch_cpu_fallback():
    # On CPU (no interpret flag) the public wrapper uses optax and the
    # relative-length convention end-to-end.
    from speechbrain_tpu.nnet.losses import ctc_loss

    lp = jax.nn.log_softmax(jnp.zeros((2, 6, 4)), -1)
    tg = jnp.array([[1, 2], [3, 1]])
    loss = ctc_loss(lp, tg, jnp.ones(2), jnp.ones(2), blank_index=0)
    assert np.isfinite(float(loss)) and float(loss) > 0
