"""Benchmark harness: training-step throughput on the real chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.

Metric: utterances/second/chip for a data-parallel training step of the
current flagship config on synthetic fixed-shape batches (the bucketed
shapes the real pipeline produces).  vs_baseline compares against
BASELINE_UTT_S — the reference SpeechBrain recipe's measured V100
throughput class for the matched model (see BASELINE.md; the reference
publishes no utt/s numbers, so this anchor is our measured/estimated
reference-throughput stand-in and is kept fixed across rounds for
comparability).
"""

import json
import os
import time

import numpy as np


def _enable_compile_cache():
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    import jax

    _enable_compile_cache()
    import jax.numpy as jnp
    import optax

    from speechbrain_tpu.core import Brain
    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.lobes.models.Xvector import Classifier, Xvector
    from speechbrain_tpu.nnet.losses import nll_loss

    SECONDS = 4.0  # audio seconds per utterance
    SR = 16000
    B = 64

    class BenchBrain(Brain):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self.fbank = Fbank(n_mels=40)

        def compute_forward(self, batch, stage):
            feats = self.fbank(batch["wav_data"]).astype(jnp.bfloat16)
            emb = self.modules.embedding_model(
                feats, lengths=batch["wav_data_lens"]
            )
            return self.modules.classifier(emb[:, 0].astype(jnp.float32))

        def compute_objectives(self, predictions, batch, stage):
            return nll_loss(
                predictions, batch["spk_id"], length=batch["batch_mask"]
            )

    brain = BenchBrain(
        modules={
            "embedding_model": Xvector(),  # full-size xvector (~4.2M)
            "classifier": Classifier(out_neurons=512),
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 1e-3},
        run_opts={"seed": 0},
    )
    rng = np.random.default_rng(0)
    batch = {
        "wav_data": rng.normal(size=(B, int(SECONDS * SR))).astype(
            np.float32
        ),
        "wav_data_lens": np.ones(B, np.float32),
        "spk_id": rng.integers(0, 512, size=B),
    }
    # Warmup (compile)
    brain.step = 1
    brain.fit_batch(batch)
    jax.block_until_ready(brain.train_state["params"])
    # Timed
    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        brain.step += 1
        brain.fit_batch(batch)
    jax.block_until_ready(brain.train_state["params"])
    dt = time.perf_counter() - t0
    n_chips = max(1, len(jax.devices()))
    utt_per_s_chip = (n_steps * B) / dt / n_chips

    # Reference anchor: SpeechBrain xvector-class training on 1xV100
    # (measured-equivalent stand-in; fixed across rounds).
    BASELINE_UTT_S = 400.0
    print(
        json.dumps(
            {
                "metric": "train_utterances_per_sec_per_chip",
                "value": round(utt_per_s_chip, 2),
                "unit": "utt/s/chip",
                "vs_baseline": round(utt_per_s_chip / BASELINE_UTT_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
