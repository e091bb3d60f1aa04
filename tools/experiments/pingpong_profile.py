"""Per-op device attribution of the beam search: ping-pong A/B.

Usage: python tools/experiments/pingpong_profile.py {0|1}

Runs ONE worst-case beam-search batch under jax.profiler.trace and
prints the TPU lane's op durations grouped by op name (top 25).
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
import __graft_entry__ as ge
from speechbrain_tpu.decoders.seq2seq import S2STransformerBeamSearch

ping = bool(int(sys.argv[1])) if len(sys.argv) > 1 else True
bench._enable_compile_cache()
brain = ge._conformer_brain(d_model=144, layers=12)
batches = [
    brain.prepare_batch(
        ge._synthetic_batch(B=16, seconds=10.0, U=40, seed=100 + i)
    )
    for i in range(2)
]
brain._ensure_initialized(batches[0])
state = brain.train_state

searcher = S2STransformerBeamSearch(
    decode_fn=lambda prefix, e, el: brain.modules.transformer(
        prefix, e, el, method="decode"
    )[0],
    cache_init_fn=lambda e, ms: brain.modules.transformer(
        e, ms, method="decode_cache_init"
    ),
    step_fn=lambda tok, cache, pos, el, rows=None: (
        brain.modules.transformer(
            tok, cache, pos, el, rows=rows, method="decode_step"
        )
    ),
    linear_fn=lambda d: brain.modules.seq_lin(d[:, None])[:, 0],
    ctc_linear_fn=lambda e: brain.modules.ctc_lin(e),
    bos_index=1, eos_index=2, blank_index=0,
    min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=10,
    ctc_weight=0.4, ctc_score_mode="partial",
    using_eos_threshold=False, length_normalization=True,
    ping_pong=ping,
)


def impl(params, model_state, extra, sig, sig_lens):
    rngs = brain._make_step_rngs(jax.random.PRNGKey(0))
    brain._bind(params, model_state, extra, rngs, train=False)
    feats = brain.fbank(sig).astype(jnp.bfloat16)
    src = brain.modules.frontend(feats)
    enc = brain.modules.transformer(src, sig_lens, method="encode")
    return searcher.search_device(enc, sig_lens, early_exit=True)


args = lambda b: (  # noqa: E731
    state["params"], state["model_state"], state["extra"],
    b["sig"], b["sig_lens"],
)
with jax.default_device(jax.devices("cpu")[0]):
    compiled = jax.jit(impl).lower(*args(batches[0])).compile()

trace_dir = f"/tmp/prof_pingpong_{int(ping)}"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    r = compiled(*args(batches[0]))
    vals = jax.device_get(r[2])
    assert np.isfinite(np.asarray(vals)).all()
    time.sleep(1.0)

by_name = {}
dev_pids = set()
names = {}
paths = glob.glob(
    os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
)
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev["args"].get("name", "")
    for ev in data.get("traceEvents", []):
        nm = names.get(ev.get("pid"), "")
        if ev.get("ph") == "X" and "dur" in ev and (
            "TPU" in nm or "/device" in nm
        ):
            key = ev["name"]
            by_name.setdefault(key, [0.0, 0])
            by_name[key][0] += ev["dur"] / 1e3
            by_name[key][1] += 1

total = sum(v[0] for v in by_name.values())
print(f"ping_pong={ping}: device busy total {total:.1f} ms (1 batch)")
for k, (ms, cnt) in sorted(
    by_name.items(), key=lambda x: -x[1][0]
)[:25]:
    print(f"  {ms:9.2f} ms  x{cnt:6d}  {k[:90]}")
