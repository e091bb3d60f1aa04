"""Logits-native fused transducer entry vs scan+log_softmax reference."""

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


def test_logits_entry_matches():
    rng = np.random.default_rng(0)
    B, T, U, V = 3, 9, 4, 7
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, V, size=(B, U)).astype(np.int32))
    t_lens = jnp.asarray([9, 7, 5], jnp.int32)
    u_lens = jnp.asarray([4, 3, 2], jnp.int32)
    ref = transducer_forward_loss(
        jax.nn.log_softmax(logits, -1), targets, t_lens, u_lens, 0
    )
    got = PT.transducer_loss_pallas_logits(
        logits, targets, t_lens, u_lens, 0
    )
    assert float(jnp.abs(ref - got).max()) < 1e-4
    gref = jax.grad(
        lambda x: transducer_forward_loss(
            jax.nn.log_softmax(x, -1), targets, t_lens, u_lens, 0
        ).sum()
    )(logits)
    ggot = jax.grad(
        lambda x: PT.transducer_loss_pallas_logits(
            x, targets, t_lens, u_lens, 0
        ).sum()
    )(logits)
    assert float(jnp.abs(gref - ggot).max()) < 1e-4
