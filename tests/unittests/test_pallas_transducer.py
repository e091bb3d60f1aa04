"""Pallas transducer kernel vs the associative-scan reference.

Runs in interpret mode on CPU (the compiled path is exercised on TPU by
bench/integration runs), mirroring the reference's CUDA-only kernel
being skipped on CPU CI (``conftest.py:14-17``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import speechbrain_tpu.ops.pallas.transducer as PT
from speechbrain_tpu.nnet.loss.transducer_loss import (
    transducer_forward_loss,
)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        PT.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _case(B=5, T=12, U=6, V=9, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(B, T, U + 1, V)).astype(np.float32)
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    targets = jnp.asarray(rng.integers(1, V, size=(B, U)).astype(np.int32))
    t_lens = jnp.asarray(
        rng.integers(max(2, T // 2), T + 1, size=B), jnp.int32
    )
    u_lens = jnp.asarray(rng.integers(1, U + 1, size=B), jnp.int32)
    return lp, targets, t_lens, u_lens


def test_forward_matches_scan():
    lp, targets, t_lens, u_lens = _case()
    ref = transducer_forward_loss(lp, targets, t_lens, u_lens, 0)
    got = PT.transducer_loss_pallas(lp, targets, t_lens, u_lens, 0)
    assert float(jnp.abs(ref - got).max()) < 1e-4


def test_gradient_matches_scan():
    lp, targets, t_lens, u_lens = _case(B=3, T=8, U=4, V=6, seed=1)
    gref = jax.grad(
        lambda x: transducer_forward_loss(x, targets, t_lens, u_lens, 0).sum()
    )(lp)
    ggot = jax.grad(
        lambda x: PT.transducer_loss_pallas(x, targets, t_lens, u_lens, 0).sum()
    )(lp)
    assert float(jnp.abs(gref - ggot).max()) < 1e-4


def test_normalize_by_T():
    lp, targets, t_lens, u_lens = _case(B=3, T=8, U=4, V=6, seed=2)
    ref = transducer_forward_loss(
        lp, targets, t_lens, u_lens, 0, normalize_by_T=True
    )
    got = PT.transducer_loss_pallas(lp, targets, t_lens, u_lens, 0, True)
    assert float(jnp.abs(ref - got).max()) < 1e-4


def test_nonzero_blank_index():
    lp, targets, t_lens, u_lens = _case(B=2, T=6, U=3, V=5, seed=3)
    targets = jnp.where(targets == 4, 1, targets)  # keep 4 free for blank
    ref = transducer_forward_loss(lp, targets, t_lens, u_lens, 4)
    got = PT.transducer_loss_pallas(lp, targets, t_lens, u_lens, 4)
    assert float(jnp.abs(ref - got).max()) < 1e-4
