import time
import jax, jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)

def chain(f, x0, iters=32):
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

# d144-class matmul
x = jnp.asarray(rng.standard_normal((4016, 144)), jnp.bfloat16)
W = jnp.asarray(rng.standard_normal((144, 144)), jnp.bfloat16)
t = chain(lambda x: x @ W, x)
print(f"(4016,144)@(144,144): {t*1e6:.0f} us", flush=True)

# batched independent: (32, 4016, 144) @ (144,144) via einsum
xb = jnp.asarray(rng.standard_normal((8, 4016, 144)), jnp.bfloat16)
t = chain(lambda x: jnp.einsum("bmk,kn->bmn", x, W), xb)
print(f"batched 8x(4016,144)@(144,144) one op: {t*1e6:.0f} us ({t*1e6/8:.0f} us each)", flush=True)

# two independent matmuls in one body (parallel streams?)
x2 = jnp.asarray(rng.standard_normal((4016, 512)), jnp.bfloat16)
W2 = jnp.asarray(rng.standard_normal((512, 2048)), jnp.bfloat16)
t = chain(lambda x: (x @ W2) + (x @ jnp.flip(W2, 0)), x2)
print(f"two indep (4016,512)@(512,2048) per body: {t*1e6:.0f} us", flush=True)

# f32 same shape
xf = jnp.asarray(rng.standard_normal((4016, 512)), jnp.float32)
Wf = jnp.asarray(rng.standard_normal((512, 2048)), jnp.float32)
t = chain(lambda x: x @ Wf, xf)
print(f"f32 (4016,512)@(512,2048): {t*1e6:.0f} us", flush=True)
