import jax, jax.numpy as jnp
import numpy as np
from speechbrain_tpu.nnet.attention import PositionalwiseFeedForward

B, T, d = 16, 251, 512
x0 = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, d)), jnp.bfloat16)
ffn = PositionalwiseFeedForward(d_ffn=4*d)
pf = ffn.init(jax.random.PRNGKey(0), x0)
vg = jax.value_and_grad(lambda x: jnp.sum(ffn.apply(pf, x, train=False).astype(jnp.float32)))
low = jax.jit(vg).lower(x0)
c = low.compile().cost_analysis()
if isinstance(c, (list, tuple)): c = c[0]
flops = c.get("flops"); byts = c.get("bytes accessed")
print(f"FFN fwd+bwd: flops={flops/1e9:.1f}G bytes={byts/1e6:.1f}MB")
print(f"roofline: max({flops/197e12*1e3:.3f} ms compute, {byts/819e9*1e3:.3f} ms HBM)")
# measured 0.982 ms
