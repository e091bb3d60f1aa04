"""Multi-host coordination helpers (single-controller JAX).

The reference coordinates ranks through ``torch.distributed`` process
groups (reference ``utils/distributed.py:14,98,107``).  In JAX, each host
runs one controller process; devices are globally visible after
``jax.distributed.initialize``.  The equivalents:

- ``run_on_main``     -> run side-effects (manifest prep, downloads) only
                          on process 0, then barrier.
- ``ddp_barrier``     -> a tiny global psum across processes.
- ``if_main_process`` -> ``jax.process_index() == 0``.

There is no per-rank model wrapping: gradient sync is done by sharding
inside the jitted train step (see ``speechbrain_tpu.parallel``).
"""

import functools
import logging

logger = logging.getLogger(__name__)

__all__ = [
    "run_on_main",
    "if_main_process",
    "main_process_only",
    "ddp_barrier",
    "ddp_init_group",
]

MAIN_PROC_ONLY = 0


def if_main_process():
    """True on the host that should perform filesystem side effects."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def main_process_only(function):
    """Decorator: run only on the main process, others get None."""

    @functools.wraps(function)
    def main_proc_wrapped_func(*args, **kwargs):
        global MAIN_PROC_ONLY
        MAIN_PROC_ONLY += 1
        try:
            if if_main_process():
                return function(*args, **kwargs)
            return None
        finally:
            MAIN_PROC_ONLY -= 1

    return main_proc_wrapped_func


def ddp_barrier():
    """Synchronize all processes (no-op single-host)."""
    global MAIN_PROC_ONLY
    if MAIN_PROC_ONLY >= 1:
        return
    try:
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("sb_tpu_barrier")
    except Exception:
        pass


def run_on_main(
    func,
    args=None,
    kwargs=None,
    post_func=None,
    post_args=None,
    post_kwargs=None,
):
    """Run ``func`` only on process 0, barrier, then ``post_func`` everywhere.

    The canonical wrapper for data-prep scripts that write manifests.
    """
    if args is None:
        args = []
    if kwargs is None:
        kwargs = {}
    if post_args is None:
        post_args = []
    if post_kwargs is None:
        post_kwargs = {}
    main_process_only(func)(*args, **kwargs)
    ddp_barrier()
    if post_func is not None:
        post_func(*post_args, **post_kwargs)


def ddp_init_group(run_opts=None):
    """Initialize multi-host JAX if coordinator info is available.

    Reads coordinator_address/num_processes/process_id from run_opts or
    environment (JAX also auto-detects on Cloud TPU).  Safe to call on a
    single host: does nothing without coordinator configuration.
    """
    import os

    import jax

    run_opts = run_opts or {}
    coord = run_opts.get("coordinator_address") or os.environ.get(
        "SB_COORDINATOR_ADDRESS"
    )
    nproc = run_opts.get("num_processes") or os.environ.get("SB_NUM_PROCESSES")
    pid = run_opts.get("process_id") or os.environ.get("SB_PROCESS_ID")
    if coord is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
        )
        logger.info(
            f"jax.distributed initialized: process {jax.process_index()} "
            f"of {jax.process_count()}"
        )
