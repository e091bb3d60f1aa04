import time
import jax, jax.numpy as jnp
import numpy as np

from speechbrain_tpu.nnet.attention import RelPosMHAXL, PositionalwiseFeedForward, RelPosEncXL
from speechbrain_tpu.lobes.models.transformer.Conformer import ConvolutionModule

B, T, d, H = 16, 251, 512, 8
ITERS = 32
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((B, T, d)), jnp.bfloat16)

def chain_time(name, value_and_grad_fn, x0):
    """ITERS dependent evals inside one jitted scan (kernel_sol method)."""
    def body(carry, _):
        x = carry
        loss, gx = value_and_grad_fn(x)
        x = x + (gx * 1e-6).astype(x.dtype) + (loss * 1e-30).astype(x.dtype)
        return x, ()
    def run(x):
        x, _ = jax.lax.scan(body, x, None, length=ITERS)
        return x
    jf = jax.jit(run)
    jax.block_until_ready(jf(x0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x0))
        best = min(best, (time.perf_counter()-t0)/ITERS)
    print(f"{name}: fwd+bwd {best*1e3:.3f} ms  (x12 layers = {12*best*1e3:.1f} ms)", flush=True)

pe_mod = RelPosEncXL(emb_dim=d)
pe = pe_mod.apply(pe_mod.init(jax.random.PRNGKey(1), x0), x0)

attn = RelPosMHAXL(embed_dim=d, num_heads=H)
pa = attn.init(jax.random.PRNGKey(0), x0, x0, x0, pe)
f1 = lambda x: attn.apply(pa, x, x, x, pe, train=False)[0]
vg1 = lambda x: jax.value_and_grad(lambda x: jnp.sum(f1(x).astype(jnp.float32)))(x)
chain_time("RelPosMHAXL", vg1, x0)

ffn = PositionalwiseFeedForward(d_ffn=4*d)
pf = ffn.init(jax.random.PRNGKey(0), x0)
f2 = lambda x: ffn.apply(pf, x, train=False)
vg2 = lambda x: jax.value_and_grad(lambda x: jnp.sum(f2(x).astype(jnp.float32)))(x)
chain_time("FFN(2048)", vg2, x0)

conv = ConvolutionModule(input_size=d, kernel_size=31)
pc = conv.init(jax.random.PRNGKey(0), x0)
f3 = lambda x: conv.apply(pc, x, train=False)
vg3 = lambda x: jax.value_and_grad(lambda x: jnp.sum(f3(x).astype(jnp.float32)))(x)
chain_time("ConvModule", vg3, x0)
