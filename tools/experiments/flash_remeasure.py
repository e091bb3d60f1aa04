"""Re-measure pallas flash attention INSIDE its stated validity region.

Round-1 rejected flash attention measured at d_head=36/T=256 with the
revisit criterion "T >= 1k, d_head >= 64" (PERFORMANCE.md:66); the
round-2 verdict noted the d512 bench config IS d_head=64 and long-form
audio reaches T >= 1k.  This measures fwd+bwd of XLA attention vs
pallas flash attention (with the rel-pos bias materialized as `ab` in
both cases) at the d512 bench shapes and at long-form shapes.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def xla_attn(q, k, v, bias):
    # q,k,v: (B, H, T, D); bias: (B, H, T, T)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    p = jax.nn.softmax(s + bias, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def measure(fn, args, iters=20):
    loss = lambda *a: jnp.sum(fn(*a).astype(jnp.float32))  # noqa: E731
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    jax.block_until_ready(g(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    fwd = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        o = g(*args)
    jax.block_until_ready(o)
    bwd = (time.perf_counter() - t0) / iters
    return fwd * 1e3, bwd * 1e3


def run(B, H, T, D, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), dtype)
    bias = jnp.asarray(
        0.1 * rng.standard_normal((B, H, T, T)), jnp.float32
    )
    fwd_x, bwd_x = measure(xla_attn, (q, k, v, bias))
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        blk = min(512, T)
        bs = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk,
            block_k_dkv=blk, block_q_dkv=blk,
            block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
        )
        fa = functools.partial(
            flash_attention, causal=False,
            sm_scale=1.0 / np.sqrt(D), block_sizes=bs,
        )
        fn = lambda q, k, v, ab: fa(q, k, v, ab=ab)  # noqa: E731
        fwd_f, bwd_f = measure(fn, (q, k, v, bias))
        # parity check
        o1 = np.asarray(jax.jit(xla_attn)(q, k, v, bias), np.float32)
        o2 = np.asarray(jax.jit(fn)(q, k, v, bias), np.float32)
        err = np.max(np.abs(o1 - o2))
    except Exception as e:
        fwd_f = bwd_f = float("nan")
        err = repr(e)
    print(
        f"B={B} H={H} T={T} D={D}: XLA {fwd_x:.2f}/{bwd_x:.2f} ms  "
        f"flash {fwd_f:.2f}/{bwd_f:.2f} ms  max|diff|={err}",
        flush=True,
    )


if __name__ == "__main__":
    run(16, 8, 256, 64)   # d512 bench class (T=251 padded to 256)
    run(4, 8, 1024, 64)   # long-form class
    run(2, 8, 2048, 64)   # very long form
