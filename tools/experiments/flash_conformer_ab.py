import time
import jax, jax.numpy as jnp
import numpy as np
from speechbrain_tpu.lobes.models.transformer.Conformer import ConformerEncoder
from speechbrain_tpu.nnet.attention import RelPosEncXL

B, T, d = 4, 1024, 512
x0 = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, d)), jnp.bfloat16)

def bench(use_flash):
    enc = ConformerEncoder(num_layers=4, d_model=d, d_ffn=4*d, nhead=8, kernel_size=31, dropout=0.0, use_flash=use_flash)
    pe = RelPosEncXL(emb_dim=d)(x0)
    params = enc.init(jax.random.PRNGKey(0), x0, None, None, pe, False)
    def loss(p, x):
        out, _ = enc.apply(p, x, None, None, pe, False)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))
    vg = jax.jit(jax.value_and_grad(loss, argnums=1))
    jax.block_until_ready(vg(params, x0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            o = vg(params, x0)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / 5)
    l, _ = vg(params, x0)
    return best, float(l)

t_xla, l_xla = bench(False)
t_fla, l_fla = bench(True)
print(f"XLA:   {t_xla*1e3:.1f} ms/encoder fwd+bwd, loss={l_xla:.1f}")
print(f"flash: {t_fla*1e3:.1f} ms/encoder fwd+bwd, loss={l_fla:.1f}")
print(f"speedup {t_xla/t_fla:.2f}x, rel loss diff {abs(l_xla-l_fla)/abs(l_xla):.2e}")
