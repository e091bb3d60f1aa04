#!/usr/bin/env python3
"""Inference RTF / memory benchmark across duration x batch grids.

Mirrors the reference's ``tools/profiling/profile.py``: measures
real-time factor (audio-seconds processed per wall-second) for a
pretrained interface or a raw encoder across a grid of utterance
durations and batch sizes.

    python tools/profiling/profile.py --durations 1 5 10 --batch-sizes 1 8 32
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import numpy as np


def profile_encoder(encode_fn, durations, batch_sizes, sample_rate=16000, n_steps=10):
    """Grid-measure encode_fn(wavs, lens) -> outputs."""
    import jax
    import jax.numpy as jnp

    results = []
    for dur in durations:
        for bs in batch_sizes:
            wav = jnp.asarray(
                np.random.default_rng(0)
                .normal(size=(bs, int(dur * sample_rate)))
                .astype(np.float32)
            )
            lens = jnp.ones(bs)
            out = encode_fn(wav, lens)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n_steps):
                out = encode_fn(wav, lens)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n_steps
            audio_s = dur * bs
            results.append(
                {
                    "duration": dur,
                    "batch_size": bs,
                    "step_ms": round(dt * 1000, 2),
                    "rtf": round(dt / audio_s, 6),
                    "audio_s_per_s": round(audio_s / dt, 1),
                }
            )
            print(json.dumps(results[-1]), flush=True)
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--durations", type=float, nargs="+", default=[1, 5, 10])
    parser.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8, 32])
    parser.add_argument("--steps", type=int, default=10)
    args = parser.parse_args()

    import jax

    from speechbrain_tpu.core import _enable_compile_cache

    _enable_compile_cache()
    import __graft_entry__ as ge

    brain = ge._conformer_brain(d_model=144, layers=12)
    batch = ge._synthetic_batch(B=2, seconds=2.0)
    db = brain.prepare_batch(batch)
    brain._ensure_initialized(db)
    state = brain.train_state

    @jax.jit
    def encode(wavs, lens):
        import jax.numpy as jnp

        brain._bind(
            state["params"], state["model_state"], state["extra"],
            {"dropout": jax.random.PRNGKey(0)}, train=False,
        )
        feats = brain.fbank(wavs).astype(jnp.bfloat16)
        src = brain.modules.frontend(feats)
        return brain.modules.transformer(src, lens, method="encode")

    profile_encoder(
        encode, args.durations, args.batch_sizes, n_steps=args.steps
    )


if __name__ == "__main__":
    main()
