"""Device-side (xplane) timing of the fused train window.

Wall clocks through the dev tunnel lie (block_until_ready can return
before execution; same-input dispatches can be elided), so the only
trustworthy per-step number is the profiler's device trace: run ONE
K=32 fused window of DISTINCT batches under jax.profiler.trace and sum
the TPU lane's op durations.

Usage: python tools/experiments/train_step_profile.py [d_model] [B]
"""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)

import jax  # noqa: E402

import bench  # noqa: E402
import __graft_entry__ as ge  # noqa: E402

bench._enable_compile_cache()


def device_busy_ms(trace_dir):
    """Sum device-lane event durations from the chrome trace dump."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    total_by_pid = {}
    names = {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                names[ev["pid"]] = ev["args"].get("name", "")
            if ev.get("ph") == "X" and "dur" in ev:
                total_by_pid.setdefault(ev["pid"], 0.0)
                total_by_pid[ev["pid"]] += ev["dur"]
    out = {}
    for pid, tot in total_by_pid.items():
        nm = names.get(pid, str(pid))
        out[nm] = out.get(nm, 0.0) + tot / 1e3
    return out


def main():
    d_model = int(sys.argv[1]) if len(sys.argv) > 1 else 144
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    K = 32
    brain = ge._conformer_brain(d_model=d_model, layers=12,
                                nhead=8 if d_model >= 512 else 4)
    batches = [
        brain.prepare_batch(
            ge._synthetic_batch(B=B, seconds=10.0, U=40, seed=i)
        )
        for i in range(8)
    ]
    jax.block_until_ready(batches)
    brain.loss_sync_interval = 10000
    brain.step = 1
    window = batches * (K // 8)
    brain.fit_batches(window)
    # force completion by fetching values, not block_until_ready
    _ = jax.device_get(brain._pending_losses)
    brain._pending_losses = []

    trace_dir = f"/tmp/prof_train_d{d_model}"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        brain.step += K
        brain.fit_batches(window)
        vals = jax.device_get(brain._pending_losses)
    wall = time.perf_counter() - t0
    lanes = device_busy_ms(trace_dir)
    print(f"wall (incl. value fetch): {wall*1e3:.1f} ms for K={K}")
    for nm, ms in sorted(lanes.items(), key=lambda kv: -kv[1]):
        print(f"  lane {nm!r}: {ms:.1f} ms total, {ms / K:.2f} ms/step")
    n = np.concatenate([np.ravel(v) for v in vals])
    print(f"losses finite: {np.isfinite(n).all()}, n={n.size}")


if __name__ == "__main__":
    main()
