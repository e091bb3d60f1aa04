import time, sys
import jax
import __graft_entry__ as ge
import bench as bench_mod

def measure(B, seconds, K=8):
    brain = ge._conformer_brain(d_model=512, layers=12, nhead=8)
    batches = [brain.prepare_batch(ge._synthetic_batch(B=B, seconds=seconds, U=40, seed=i)) for i in range(4)]
    jax.block_until_ready(batches)
    window = batches + batches
    brain.loss_sync_interval = 200
    brain.step = 1
    brain.fit_batches(window[:K])
    jax.block_until_ready(brain.train_state["params"])
    t0 = time.perf_counter()
    for _ in range(2):
        brain.step += K
        brain.fit_batches(window[:K])
    jax.block_until_ready(brain.train_state["params"])
    dt = time.perf_counter() - t0
    sec_per_step = dt / (2 * K)
    flops = bench_mod._step_flops(brain, batches[0])
    peak = 197e12
    mfu = flops / sec_per_step / peak if flops else None
    print(f"B={B} sec={seconds}: {sec_per_step*1e3:.1f} ms/step, {2*K*B/dt:.1f} utt/s, flops={flops and flops/1e9:.0f}G, MFU={mfu and round(mfu,4)}", flush=True)

for B, sec in [(16, 10.0)]:
    measure(B, sec)
