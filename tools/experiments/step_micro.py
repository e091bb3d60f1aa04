import time
import jax, jax.numpy as jnp
import numpy as np
import __graft_entry__ as ge

brain = ge._conformer_brain(d_model=144, layers=12)
B, beam = 16, 10
n = B * beam
b0 = brain.prepare_batch(ge._synthetic_batch(B=B, seconds=10.0, U=40, seed=100))
brain._ensure_initialized(b0)
state = brain.train_state

def run(params, model_state, extra, sig, sig_lens):
    rngs = brain._make_step_rngs(jax.random.PRNGKey(0))
    brain._bind(params, model_state, extra, rngs, train=False)
    feats = brain.fbank(sig).astype(jnp.bfloat16)
    src = brain.modules.frontend(feats)
    enc = brain.modules.transformer(src, sig_lens, method="encode")
    enc_i = jnp.repeat(enc, beam, axis=0)
    import sys
    CL = int(sys.argv[1]) if len(sys.argv) > 1 else 251
    cache = brain.modules.transformer(enc_i, CL, method="decode_cache_init")
    el = jnp.repeat(sig_lens, beam, axis=0)

    def body(carry, t):
        tok, cache = carry
        out, cache = brain.modules.transformer(tok, cache, jnp.mod(t, CL), el, method="decode_step")
        logits = brain.modules.seq_lin(out[:, None])[:, 0]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return (tok, cache), ()

    (tok, cache), _ = jax.lax.scan(
        body, (jnp.zeros((n,), jnp.int32), cache), jnp.arange(251)
    )
    return tok

cpus = jax.devices("cpu")
args = (state["params"], state["model_state"], state["extra"], b0["sig"], b0["sig_lens"])
with jax.default_device(cpus[0]):
    lowered = jax.jit(run).lower(*args)
compiled = lowered.compile()
jax.block_until_ready(compiled(*args))
t0 = time.perf_counter()
for _ in range(3):
    r = compiled(*args)
jax.block_until_ready(r)
dt = (time.perf_counter() - t0) / 3
print(f"decode_step-only scan: {dt*1e3:.1f} ms/batch, {dt/251*1e6:.0f} us/step")
