"""Two-process jax.distributed test on localhost (CPU backend).

The TPU equivalent of the reference's gloo-on-localhost DDP test
(``tests/integration/sampling/example_sorting.py:185``): each process
takes its sampler shard, and the union of per-rank example ids must
cover the dataset exactly; a psum across processes verifies the
collective path.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:{port}",
    num_processes=2,
    process_id={rank},
)
import jax.numpy as jnp
from jax.experimental import multihost_utils

sys.path.insert(0, {repo!r})
from speechbrain_tpu.dataio.sampler import (
    DistributedSamplerWrapper, ReproducibleRandomSampler,
)

base = ReproducibleRandomSampler(range(16), seed=5)
shard = list(
    DistributedSamplerWrapper(base, num_replicas=2, rank={rank})
)
# Collective check: global psum over one scalar per process.
total = multihost_utils.process_allgather(jnp.asarray([len(shard)]))
out = {{"rank": {rank}, "shard": shard, "total": total.sum().item()}}
print("RESULT:" + json.dumps(out))
"""


def _run_once():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    procs = []
    for rank in range(2):
        code = WORKER.format(port=port, rank=rank, repo=repo)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
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
            stdout, stderr = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            p.kill()
            return None, "timeout"
        if p.returncode != 0:
            return None, stderr[-500:]
        outs.append(stdout)
    import json

    results = []
    for out in outs:
        lines = [
            l for l in out.splitlines() if l.startswith("RESULT:")
        ]
        if not lines:
            return None, f"no RESULT line in: {out[-300:]}"
        try:
            results.append(json.loads(lines[0][len("RESULT:"):]))
        except json.JSONDecodeError as e:
            # Interleaved stdout under load — treat as a transient
            # environment failure (retried / skipped by the caller).
            return None, f"bad RESULT line ({e}): {lines[0][:300]}"
    return results, None


def test_two_process_sharding(tmp_path):
    # The coordinator handshake can collide with other tests' jax
    # runtimes; retry once before skipping.
    results, err = _run_once()
    if results is None:
        results, err = _run_once()
    if results is None:
        pytest.skip(f"jax.distributed unavailable here: {err}")
    shards = [set(r["shard"]) for r in results]
    assert shards[0] | shards[1] == set(range(16))
    assert shards[0] & shards[1] == set()
    assert all(r["total"] == 16 for r in results)
