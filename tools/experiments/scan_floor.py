import time
import jax, jax.numpy as jnp
import numpy as np

def floor_test(shape, iters=64):
    x0 = jnp.zeros(shape, jnp.bfloat16)
    def body(c, _):
        return c * 1.0000001, ()
    jf = jax.jit(lambda x: jax.lax.scan(body, x, None, length=iters)[0])
    jax.block_until_ready(jf(x0))
    t0 = time.perf_counter(); jax.block_until_ready(jf(x0))
    dt = (time.perf_counter()-t0)/iters
    print(f"scan floor {shape}: {dt*1e6:.1f} us/iter", flush=True)

floor_test((8, 128))
floor_test((2048, 512))
floor_test((4096, 2048))

# matmul floor WITHOUT scan: unrolled chain of 32 dependent matmuls in one jit
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((4096, 512)), jnp.bfloat16)
W = jnp.asarray(rng.standard_normal((512, 2048)), jnp.bfloat16)
W2 = jnp.asarray(rng.standard_normal((2048, 512)), jnp.bfloat16)
def unrolled(x):
    for _ in range(16):
        y = x @ W
        x = y @ W2
    return x
jf = jax.jit(unrolled)
jax.block_until_ready(jf(x))
t0 = time.perf_counter(); jax.block_until_ready(jf(x))
dt = (time.perf_counter()-t0)/32
gf = 2*4096*512*2048/1e9
print(f"unrolled matmul: {dt*1e6:.0f} us each -> {gf/1e3/dt/197:.0%} of peak")
