import time
import jax, jax.numpy as jnp
import numpy as np

n, L, h, dh = 160, 251, 4, 36
rows = jnp.asarray(np.random.default_rng(0).integers(0, n, n))

def bench(shape, label, iters=50):
    x = jnp.zeros(shape, jnp.bfloat16)
    def f(x, rows):
        def body(c, _):
            x, rows = c
            x = x[rows]
            rows = (rows + 1) % n
            return (x, rows), ()
        (x, rows), _ = jax.lax.scan(body, (x, rows), None, length=iters)
        return x
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(x, rows))
    t0 = time.perf_counter()
    out = jax.block_until_ready(jf(x, rows))
    dt = (time.perf_counter() - t0) / iters
    logical = np.prod(shape) * 2 / 1e6
    print(f"{label} {shape}: {dt*1e6:.0f} us/gather, logical {logical:.1f} MB -> {2*logical/1e3/dt:.0f} GB/s eff")

bench((n, L, h, dh), "4d-small-tail")
bench((n, L, h * dh), "3d-(n,L,144) ")
bench((n, h * dh, L), "3d-(n,144,L) ")
bench((n, h * dh, 256), "3d-(n,144,256)")
bench((n, 256, h * dh), "3d-(n,256,144)")
