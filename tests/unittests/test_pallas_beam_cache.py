"""Fused beam-cache kernel (ops/pallas/beam_cache.py) unit tests.

The Pallas kernel runs in interpret mode on CPU; the XLA fallback
(`_xla_ref` = gather + `append_attend`) is the semantic oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speechbrain_tpu.ops.pallas.beam_cache import (
    append_attend,
    beam_attend_step,
    _xla_ref,
)


def _mk(n, H, Dh, L, dtype, seed=0):
    rng = np.random.default_rng(seed)
    HD = H * Dh
    kv = jnp.asarray(rng.standard_normal((n, HD, 2 * L)), dtype)
    rows = jnp.asarray(rng.integers(0, n, n), jnp.int32)
    q = jnp.asarray(rng.standard_normal((n, HD)), dtype)
    kn = jnp.asarray(rng.standard_normal((n, HD)), dtype)
    vn = jnp.asarray(rng.standard_normal((n, HD)), dtype)
    return kv, rows, q, kn, vn


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("pos", [0, 5, 15])
def test_kernel_matches_xla_ref(dtype, pos):
    n, H, Dh, L = 8, 2, 8, 16
    kv, rows, q, kn, vn = _mk(n, H, Dh, L, dtype)
    pos = jnp.asarray(pos, jnp.int32)
    o1, kv1 = beam_attend_step(
        kv, rows, q, kn, vn, pos, H, interpret=True
    )
    o2, kv2 = _xla_ref(kv, rows, pos, q, kn, vn, H)
    # cache update is exact (dtype passthrough + new columns)
    assert (
        np.asarray(kv1, np.float32) == np.asarray(kv2, np.float32)
    ).all()
    # context: exact bf16 products, f32 accumulation — only the
    # bf16-probability rounding in the context matmul differs.
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(o1, np.float32), np.asarray(o2, np.float32),
        atol=atol, rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
    )


def test_causal_mask_and_append():
    """Columns beyond pos never contribute; the appended K/V do."""
    n, H, Dh, L = 4, 2, 4, 8
    kv, rows, q, kn, vn = _mk(n, H, Dh, L, jnp.float32, seed=1)
    rows = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.asarray(3, jnp.int32)
    o1, kv1 = beam_attend_step(
        kv, rows, q, kn, vn, pos, H, interpret=True
    )
    # poisoning the masked region must not change the output
    poisoned = kv.at[:, :, 4:L].set(1e9).at[:, :, L + 4:].set(1e9)
    o2, _ = beam_attend_step(
        poisoned, rows, q, kn, vn, pos, H, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(o2), atol=1e-5
    )
    # the appended columns land at pos / L+pos
    assert (np.asarray(kv1)[:, :, 3] == np.asarray(kn)).all()
    assert (np.asarray(kv1)[:, :, L + 3] == np.asarray(vn)).all()


def test_permutation_routes_history():
    """Output row i must attend row rows[i]'s history."""
    n, H, Dh, L = 6, 2, 4, 8
    kv, _, q, kn, vn = _mk(n, H, Dh, L, jnp.float32, seed=2)
    rows = jnp.asarray([3, 3, 0, 5, 1, 1], jnp.int32)
    pos = jnp.asarray(4, jnp.int32)
    o_perm, kv_perm = beam_attend_step(
        kv, rows, q, kn, vn, pos, H, interpret=True
    )
    o_pre, kv_pre = beam_attend_step(
        jnp.take(kv, rows, axis=0), jnp.arange(n, dtype=jnp.int32),
        q, kn, vn, pos, H, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(o_perm), np.asarray(o_pre), atol=1e-6
    )
    assert (np.asarray(kv_perm) == np.asarray(kv_pre)).all()


def test_append_attend_matches_manual_softmax():
    n, H, Dh, L = 3, 2, 4, 8
    kv, _, q, kn, vn = _mk(n, H, Dh, L, jnp.float32, seed=4)
    pos = jnp.asarray(2, jnp.int32)
    out, kv2 = append_attend(kv, pos, q, kn, vn, H)
    kvn = np.asarray(kv2)
    K = kvn[:, :, :L].reshape(n, H, Dh, L)
    V = kvn[:, :, L:].reshape(n, H, Dh, L)
    qn = np.asarray(q).reshape(n, H, Dh)
    s = np.einsum("nhd,nhdl->nhl", qn, K)[..., : int(pos) + 1]
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum(
        "nhl,nhdl->nhd", p, V[..., : int(pos) + 1]
    ).reshape(n, H * Dh)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
