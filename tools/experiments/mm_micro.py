import time
import jax, jax.numpy as jnp
import numpy as np

def chain(f, x0, iters=64):
    def body(c, _):
        y = f(c)
        return (c + (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(c.dtype)), ()
    jf = jax.jit(lambda x: jax.lax.scan(body, x, None, length=iters)[0])
    jax.block_until_ready(jf(x0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(jf(x0))
        best = min(best, (time.perf_counter()-t0)/iters)
    return best

rng = np.random.default_rng(0)
for (M, K, N) in [(4016, 512, 2048), (4096, 512, 2048), (4016, 2048, 512), (4096, 4096, 4096)]:
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    W = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    t = chain(lambda x: x @ W, x)
    gf = 2*M*K*N/1e9
    print(f"({M},{K})@({K},{N}): {t*1e6:.0f} us, {gf/t/1e3:.0f} GFLOP/ms -> {gf/1e3/t/197:.0%} of peak", flush=True)

print("--- K sweep (M=N=2048) ---")
for K in [128, 256, 512, 1024, 2048]:
    x = jnp.asarray(rng.standard_normal((2048, K)), jnp.bfloat16)
    W = jnp.asarray(rng.standard_normal((K, 2048)), jnp.bfloat16)
    t = chain(lambda x: x @ W, x)
    gf = 2*2048*K*2048/1e9
    print(f"K={K}: {t*1e6:.0f} us -> {gf/1e3/t/197:.0%} of peak", flush=True)
print("--- N sweep (M=4096, K=512) ---")
for N in [512, 1024, 2048, 4096]:
    x = jnp.asarray(rng.standard_normal((4096, 512)), jnp.bfloat16)
    W = jnp.asarray(rng.standard_normal((512, N)), jnp.bfloat16)
    t = chain(lambda x: x @ W, x)
    gf = 2*4096*512*N/1e9
    print(f"N={N}: {t*1e6:.0f} us -> {gf/1e3/t/197:.0%} of peak", flush=True)
print("--- f32 accum hint ---")
x = jnp.asarray(rng.standard_normal((4096, 512)), jnp.bfloat16)
W = jnp.asarray(rng.standard_normal((512, 2048)), jnp.bfloat16)
t = chain(lambda x: jax.lax.dot_general(x, W, (((1,),(0,)),((),())), preferred_element_type=jnp.float32).astype(jnp.bfloat16), x)
print(f"pref_f32: {t*1e6:.0f} us")
