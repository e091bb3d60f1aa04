"""Tunnel-clean GEMM efficiency at the bench-class shapes.

The round-3 GEMM micros ran one matmul per program and carried a
per-call tunnel artifact ("indicative, not exact").  Here each
measurement is ONE compiled program executing a data-dependent chain of
K identical GEMMs (lax.scan with the activation as carry, so nothing
can be CSE'd or overlapped), amortizing dispatch to nothing.  Prints
achieved TFLOP/s and % of bf16 peak per shape.

Backs PERFORMANCE.md round 4 (MFU bound attribution).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16
K_CHAIN = 64
REPS = 4


def aot(fn, *args):
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        low = jax.jit(fn).lower(*args)
    return low.compile()


def measure(label, M, K, N, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    # COMMIT inputs to the accelerator: uncommitted arrays make the
    # cpu-default-device AOT lowering silently target the CPU backend
    # (the round-4 footgun that invalidated the first micro round).
    dev = jax.devices()[0]
    x0 = jax.device_put(
        jnp.asarray(rng.standard_normal((M, K)) * 0.05, dtype), dev
    )
    w1 = jax.device_put(
        jnp.asarray(rng.standard_normal((K, N)) * 0.05, dtype), dev
    )
    w2 = jax.device_put(
        jnp.asarray(rng.standard_normal((N, K)) * 0.05, dtype), dev
    )

    def chain(x, w1, w2):
        def body(y, _):
            y = (y @ w1) @ w2  # (M,K)@(K,N) then (M,N)@(N,K)
            # keep magnitudes bounded without touching the MXU path
            y = y * jnp.bfloat16(0.5) if dtype == jnp.bfloat16 else y * 0.5
            return y, None

        y, _ = jax.lax.scan(body, x, None, length=K_CHAIN)
        return y

    c = aot(chain, x0, w1, w2)
    jax.block_until_ready(c(x0, w1, w2))
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = c(x0, w1, w2)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / REPS
    flops = 2 * 2 * M * K * N * K_CHAIN  # two GEMMs per chain step
    tflops = flops / dt / 1e12
    print(
        f"{label:34s} ({M},{K})x({K},{N}): "
        f"{tflops:7.1f} TFLOP/s = {tflops * 1e12 / PEAK * 100:5.1f}% peak",
        flush=True,
    )


if __name__ == "__main__":
    measure("bench FFN fwd-class", 4016, 512, 2048)
    measure("bench FFN fwd, M padded to 4096", 4096, 512, 2048)
    measure("bench FFN bwd-dgrad-class", 4016, 2048, 512)
    measure("attention proj class", 4016, 512, 512)
    measure("square control", 4096, 4096, 4096)
    measure("K=512 wide control", 4096, 512, 4096)
