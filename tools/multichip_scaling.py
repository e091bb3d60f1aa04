#!/usr/bin/env python3
"""Multichip scaling proxy on a virtual device mesh (no real pod).

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/multichip_scaling.py

Until real multi-chip hardware is available, two falsifiable stand-ins
for the >=80%-linear-scaling claim (VERDICT round-1 item 9):

1. **Per-step collective traffic**: the optimized HLO of the jitted
   data-parallel train step is parsed for all-reduce/reduce-scatter/
   all-gather ops and their payload bytes summed.  For pure data
   parallelism this must equal the gradient size (one fused all-reduce
   over ~P parameters) and must NOT grow with the device count —
   that's the property linear weak scaling rests on.
2. **Weak-scaling step time** on the virtual mesh (same per-device
   batch, 1/2/4/8 devices).  Virtual devices share one host's cores,
   so absolute times are meaningless and compute time rises with the
   total batch; the value of the table is STRUCTURAL: the program
   compiles and runs at every mesh size with one collective, and the
   collective bytes stay flat.

Writes a markdown table to stdout (docs/multichip.md embeds a run).
"""

import os
import re
import sys
import time

N = int(os.environ.get("SCALING_MAX_DEVICES", "8"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVE_RE = re.compile(
    r"(all-reduce|reduce-scatter|all-gather)[^\s]*\s*=\s*"
    r"((?:\([^)]*\))|(?:[a-z0-9]+\[[^\]]*\]))"
)
SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
    "pred": 1,
}


def collective_bytes(hlo_text):
    """Sum payload bytes over collective ops in optimized HLO."""
    total = 0
    ops = 0
    for m in COLLECTIVE_RE.finditer(hlo_text):
        ops += 1
        for dt, dims in SHAPE_RE.findall(m.group(2)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * DTYPE_BYTES.get(dt, 4)
    return ops, total


def main():
    import __graft_entry__ as ge

    per_device_B = 2
    seconds = 2.0
    rows = []
    devices = [d for d in (1, 2, 4, 8) if d <= jax.device_count()]
    for n_dev in devices:
        brain = ge._conformer_brain(d_model=64, layers=2)
        # restrict the mesh to the first n_dev devices
        from jax.sharding import Mesh

        from speechbrain_tpu.parallel import mesh as mesh_mod

        brain.mesh = Mesh(
            np.array(jax.devices()[:n_dev]).reshape(n_dev, 1),
            ("data", "model"),
        )
        batch = ge._synthetic_batch(
            B=per_device_B * n_dev, seconds=seconds, U=10, seed=0
        )
        device_batch = brain.prepare_batch(batch)
        brain._ensure_initialized(device_batch)
        fn = brain._get_jitted("train")
        lowered = fn.lower(
            brain.train_state, device_batch, jax.random.PRNGKey(0),
            brain.lr,
        )
        compiled = lowered.compile()
        ops, cbytes = collective_bytes(compiled.as_text())
        n_params = sum(
            int(np.prod(np.shape(x)))
            for x in jax.tree.leaves(brain.train_state["params"])
        )
        # timed steps (donated state: rebuild via fit_batch path)
        brain.loss_sync_interval = 100
        for _ in range(2):  # warmup
            brain.step += 1
            brain.fit_batch(batch)
        jax.block_until_ready(brain.train_state["params"])
        t0 = time.perf_counter()
        n_steps = 5
        for _ in range(n_steps):
            brain.step += 1
            brain.fit_batch(batch)
        jax.block_until_ready(brain.train_state["params"])
        dt = (time.perf_counter() - t0) / n_steps
        rows.append((n_dev, per_device_B * n_dev, ops, cbytes, n_params, dt))

    print(
        "| devices | global batch | collective ops | collective MB "
        "| params | step ms |"
    )
    print("|---|---|---|---|---|---|")
    base_bytes = rows[0][3]
    for n_dev, gb, ops, cbytes, n_params, dt in rows:
        print(
            f"| {n_dev} | {gb} | {ops} | {cbytes / 1e6:.2f} "
            f"| {n_params / 1e6:.2f}M | {dt * 1e3:.1f} |"
        )
    multi = [r for r in rows if r[0] > 1]
    if multi:
        growth = max(r[3] for r in multi) / max(multi[0][3], 1)
        print(
            f"\ncollective-bytes growth from {multi[0][0]} to "
            f"{multi[-1][0]} devices: {growth:.2f}x "
            f"({'FLAT — weak scaling structurally sound' if growth < 1.2 else 'GROWING — investigate'})"
        )


if __name__ == "__main__":
    main()
