import sys
import jax, jax.numpy as jnp
import __graft_entry__ as ge
from speechbrain_tpu.decoders.seq2seq import S2STransformerBeamSearch

beam, ctc_w, B = 10, 0.4, 16
brain = ge._conformer_brain(d_model=144, layers=12)
b0 = brain.prepare_batch(ge._synthetic_batch(B=B, seconds=10.0, U=40, seed=100))
brain._ensure_initialized(b0)
state = brain.train_state
searcher = S2STransformerBeamSearch(
    decode_fn=lambda prefix, e, el: brain.modules.transformer(prefix, e, el, method="decode")[0],
    cache_init_fn=lambda e, ms: brain.modules.transformer(e, ms, method="decode_cache_init"),
    step_fn=lambda tok, cache, pos, el: brain.modules.transformer(tok, cache, pos, el, method="decode_step"),
    linear_fn=lambda d: brain.modules.seq_lin(d[:, None])[:, 0],
    ctc_linear_fn=lambda e: brain.modules.ctc_lin(e),
    bos_index=1, eos_index=2, blank_index=0,
    min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=beam,
    ctc_weight=ctc_w, ctc_score_mode="partial",
    using_eos_threshold=False, length_normalization=True,
)
def impl(params, model_state, extra, sig, sig_lens):
    rngs = brain._make_step_rngs(jax.random.PRNGKey(0))
    brain._bind(params, model_state, extra, rngs, train=False)
    feats = brain.fbank(sig).astype(jnp.bfloat16)
    src = brain.modules.frontend(feats)
    enc = brain.modules.transformer(src, sig_lens, method="encode")
    return searcher.search_device(enc, sig_lens, early_exit=True)
cpus = jax.devices("cpu")
args = (state["params"], state["model_state"], state["extra"], b0["sig"], b0["sig_lens"])
with jax.default_device(cpus[0]):
    lowered = jax.jit(impl).lower(*args)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, (list, tuple)): ca = ca[0]
print({k: v for k, v in ca.items() if "bytes" in k or "flops" in k or "optimal" in k})
txt = compiled.as_text()
open("/tmp/search_hlo.txt", "w").write(txt)
print("hlo chars:", len(txt))
