"""Round-5 attribution of the end-to-end (disk -> chip) training gap.

BENCH_r04: end_to_end_utt_s 48.66 vs host_pipeline_utt_s 398 vs device
step 1007.  This script times each stage of the e2e loop separately on
the real TPU to find where the ~0.5 s/batch goes:

  A. loader next()          (decode + bucket + collate, host)
  B. prepare_batch pad      (numpy, host)
  C. shard_batch device_put (H2D through the tunnel), blocked
  D. fit_batch dispatch     (jitted step dispatch, async)
  E. full fit_batch loop    (the 48.66 number, reproduced)
  F. pre-staged fit_batch   (chip-only rate for reference)

Run: python tools/experiments/e2e_attribution.py
"""

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


def main():
    manifest = bench._ensure_corpus()
    out = {}

    # --- A: loader alone -------------------------------------------
    loader = bench._e2e_loader(manifest)
    batches_host = [b for b in loader]  # warm epoch
    t0 = time.perf_counter()
    n = 0
    nb = 0
    for b in loader:
        n += bench._n_real(b)
        nb += 1
    dt = time.perf_counter() - t0
    out["A_loader_utt_s"] = round(n / dt, 1)
    out["A_loader_ms_per_batch"] = round(dt / nb * 1e3, 1)
    out["n_batches_per_epoch"] = nb

    brain = ge._conformer_brain(d_model=144, layers=12)

    # --- B: pad only (numpy) ---------------------------------------
    numeric = [b.numeric_dict() for b in batches_host]
    out["leaves_per_batch"] = len(numeric[0])
    out["bytes_per_batch"] = int(
        sum(np.asarray(v).nbytes for v in numeric[0].values())
    )

    # --- C: device_put blocked -------------------------------------
    from speechbrain_tpu.parallel.sharding import shard_batch

    # warm (first put allocs)
    d = shard_batch(brain.mesh, numeric[0])
    jax.block_until_ready(d)
    t0 = time.perf_counter()
    for nm in numeric:
        d = shard_batch(brain.mesh, nm)
        jax.block_until_ready(d)
    dt = time.perf_counter() - t0
    out["C_device_put_ms_per_batch"] = round(dt / len(numeric) * 1e3, 1)

    # C2: single-leaf put of the big sig array only
    t0 = time.perf_counter()
    for nm in numeric:
        d = shard_batch(brain.mesh, {"sig": nm["sig"]})
        jax.block_until_ready(d)
    dt = time.perf_counter() - t0
    out["C2_sig_only_ms"] = round(dt / len(numeric) * 1e3, 1)

    # C3: all leaves in ONE flat jax.device_put call (list pytree)
    from speechbrain_tpu.parallel.sharding import batch_sharding

    sh = batch_sharding(brain.mesh)
    t0 = time.perf_counter()
    for nm in numeric:
        vals = jax.device_put(list(nm.values()), sh)
        jax.block_until_ready(vals)
    dt = time.perf_counter() - t0
    out["C3_one_call_ms"] = round(dt / len(numeric) * 1e3, 1)

    # C4: one PACKED transfer: everything as bytes in a single array
    packed = []
    for nm in numeric:
        bufs = [np.asarray(v) for v in nm.values()]
        flat = np.concatenate([b.reshape(-1).view(np.uint8) for b in bufs])
        packed.append(flat)
    t0 = time.perf_counter()
    for p in packed:
        d = jax.device_put(p)
        jax.block_until_ready(d)
    dt = time.perf_counter() - t0
    out["C4_packed_bytes_ms"] = round(dt / len(packed) * 1e3, 1)

    # --- E: full fit_batch loop (reproduce 48.66) -------------------
    brain.loss_sync_interval = 200
    brain.step = 1
    for b in batches_host:
        brain.step += 1
        brain.fit_batch(b)
    jax.block_until_ready(brain.train_state["params"])
    t0 = time.perf_counter()
    n = 0
    for b in batches_host:
        brain.step += 1
        brain.fit_batch(b)
        n += bench._n_real(b)
    jax.block_until_ready(brain.train_state["params"])
    dt = time.perf_counter() - t0
    out["E_e2e_utt_s"] = round(n / dt, 1)
    out["E_ms_per_batch"] = round(dt / len(batches_host) * 1e3, 1)

    # --- F: pre-staged device batches ------------------------------
    staged = [brain.prepare_batch(b) for b in batches_host]
    jax.block_until_ready(staged)
    t0 = time.perf_counter()
    n = 0
    for s, b in zip(staged, batches_host):
        brain.step += 1
        brain.fit_batch(s)
        n += bench._n_real(b)
    jax.block_until_ready(brain.train_state["params"])
    dt = time.perf_counter() - t0
    out["F_staged_utt_s"] = round(n / dt, 1)
    out["F_ms_per_batch"] = round(dt / len(staged) * 1e3, 1)

    # --- G: overlap test: device_put from a background thread while
    # the main thread dispatches compute on already-staged batches ---
    import threading

    stage_times = []

    def stager():
        for nm in numeric:
            t0 = time.perf_counter()
            d = shard_batch(brain.mesh, nm)
            jax.block_until_ready(d)
            stage_times.append(time.perf_counter() - t0)

    th = threading.Thread(target=stager)
    t0 = time.perf_counter()
    th.start()
    for s in staged:
        brain.step += 1
        brain.fit_batch(s)
    th.join()
    jax.block_until_ready(brain.train_state["params"])
    dt = time.perf_counter() - t0
    out["G_overlap_total_ms_per_batch"] = round(
        dt / len(numeric) * 1e3, 1
    )
    out["G_serial_sum_ms_per_batch"] = round(
        out["C_device_put_ms_per_batch"] + out["F_ms_per_batch"], 1
    )

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
