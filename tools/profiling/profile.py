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


def profile_decode(
    brain, state, durations, batch_sizes, beam_size=10,
    sample_rate=16000, n_repeats=2,
):
    """Grid-measure the FULL serving path — features -> encoder ->
    KV-cached beam search — as one compiled program per grid point
    (the reference harness profiles pretrained models end to end
    including search, ``tools/profiling/profile.py:1-60``; this is the
    on-chip equivalent)."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.decoders.seq2seq import (
        S2STransformerBeamSearch,
    )

    searcher = S2STransformerBeamSearch(
        decode_fn=lambda prefix, e, el: brain.modules.transformer(
            prefix, e, el, method="decode"
        )[0],
        cache_init_fn=lambda e, ms: brain.modules.transformer(
            e, ms, method="decode_cache_init"
        ),
        step_fn=lambda tok, cache, pos, el: brain.modules.transformer(
            tok, cache, pos, el, method="decode_step"
        ),
        linear_fn=lambda d: brain.modules.seq_lin(d[:, None])[:, 0],
        ctc_linear_fn=lambda e: brain.modules.ctc_lin(e),
        bos_index=1, eos_index=2, blank_index=0,
        min_decode_ratio=0.0, max_decode_ratio=1.0,
        beam_size=beam_size, ctc_weight=0.4,
        ctc_score_mode="partial",
        using_eos_threshold=False, length_normalization=True,
    )

    def search_impl(params, model_state, extra, sig, sig_lens):
        rngs = brain._make_step_rngs(jax.random.PRNGKey(0))
        brain._bind(params, model_state, extra, rngs, train=False)
        feats = brain.fbank(sig).astype(jnp.bfloat16)
        src = brain.modules.frontend(feats)
        enc = brain.modules.transformer(src, sig_lens, method="encode")
        return searcher.search_device(enc, sig_lens, early_exit=True)

    results = []
    for dur in durations:
        for bs in batch_sizes:
            wav = jnp.asarray(
                np.random.default_rng(0)
                .normal(size=(bs, int(dur * sample_rate)))
                .astype(np.float32)
            )
            lens = jnp.ones(bs)
            args = (
                state["params"], state["model_state"], state["extra"],
                wav, lens,
            )
            cpus = jax.devices("cpu")
            with jax.default_device(cpus[0]):
                lowered = jax.jit(search_impl).lower(*args)
            compiled = lowered.compile()
            jax.block_until_ready(compiled(*args))
            t0 = time.perf_counter()
            for _ in range(n_repeats):
                out = compiled(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n_repeats
            audio_s = dur * bs
            results.append(
                {
                    "mode": "decode_beam",
                    "duration": dur,
                    "batch_size": bs,
                    "beam": beam_size,
                    "batch_ms": round(dt * 1000, 2),
                    "rtf": round(dt / audio_s, 6),
                    "utt_s": round(bs / dt, 2),
                }
            )
            print(json.dumps(results[-1]), flush=True)
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--durations", type=float, nargs="+", default=[1, 5, 10])
    parser.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8, 32])
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument(
        "--decode", action="store_true",
        help="profile the full decode path (beam search) instead of "
        "the encoder only",
    )
    parser.add_argument("--beam", type=int, default=10)
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

    if args.decode:
        profile_decode(
            brain, state, args.durations, args.batch_sizes,
            beam_size=args.beam,
        )
    else:
        profile_encoder(
            encode, args.durations, args.batch_sizes, n_steps=args.steps
        )


if __name__ == "__main__":
    main()
