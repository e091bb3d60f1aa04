"""The Brain training engine: jitted train steps + host-side epoch loop.

Architectural translation from the reference (``core.py:339`` Brain):

- ``compute_forward`` / ``compute_objectives`` are still user overrides,
  but they must be PURE traced functions of the batch: together they form
  the loss function that gets jit-compiled with value_and_grad, gradient
  clipping, optax update and donated state — one XLA program per batch
  shape bucket (``fit_batch``, reference ``core.py:882``).
- Modules are flax modules; parameters/optimizer state live in a single
  ``TrainState`` pytree, replicated over the device mesh.  Batches are
  sharded on dim 0 (data parallel); XLA inserts the gradient all-reduce
  (the DDP replacement, reference ``core.py:1238``).
- ``self.modules.<name>(...)`` inside compute_forward transparently
  routes through ``flax.apply`` with the right parameter slice, rng
  plumbing, train flags and mutable-state collection — or ``init`` on
  the first batch (lazy shape inference, preserving the reference's
  deferred-init ergonomics).
- Host-side behaviours preserved: Stage enum, stage hooks, debug-mode
  truncation, nonfinite-loss patience (``core.py:951``), gradient
  accumulation (``core.py:903``), time-based intra-epoch checkpoints
  (``core.py:1065``), checkpoint recovery on fit start (``core.py:826``).
"""

import argparse
import functools
import inspect
import logging
import os
import sys
import threading
import time
from enum import Enum, auto
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speechbrain_tpu.dataio.batch import PaddedBatch
from speechbrain_tpu.dataio.dataloader import (
    DataLoader,
    LoopedLoader,
    SaveableDataLoader,
    make_dataloader,
)
from speechbrain_tpu.parallel.mesh import make_mesh
from speechbrain_tpu.parallel.sharding import place_state, shard_batch
from speechbrain_tpu.utils.checkpoints import (
    Recoverable,
    mark_as_loader,
    mark_as_saver,
    register_checkpoint_hooks,
)
from speechbrain_tpu.utils.distributed import if_main_process, run_on_main

logger = logging.getLogger(__name__)


def make_prng_key(seed):
    """Seed PRNG key with a TPU-appropriate implementation.

    On TPU the default threefry2x32 generator is compute-bound VPU work
    that dominated the conformer train step (measured: 65.5 → 36.8
    ms/step at bench shapes by switching to the hardware-backed ``rbg``
    bit generator — threefry dropout masks alone cost ~28 ms).  CPU
    keeps threefry so test vectors are unchanged.  Override with
    ``SB_PRNG_IMPL=threefry2x32|rbg|unsafe_rbg``.
    """
    impl = os.environ.get("SB_PRNG_IMPL")
    if impl is None and jax.default_backend() == "tpu":
        impl = "rbg"
    if impl:
        # Typed keys carry their impl through split/fold_in (raw
        # uint32 keys would be re-wrapped with the global default).
        return jax.random.key(seed, impl=impl)
    return jax.random.PRNGKey(seed)


__all__ = [
    "Stage",
    "Brain",
    "create_experiment_directory",
    "parse_arguments",
]

DEFAULT_LOG_CONFIG = None
INTRA_EPOCH_CKPT_FLAG = "brain_intra_epoch_ckpt"


def _enable_compile_cache():
    """Persistent XLA compilation cache (idempotent).

    Remote-compile TPU environments pay tens of seconds per cold
    compile; cached reloads take <1s.  Disable with
    SB_TPU_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("SB_TPU_NO_COMPILE_CACHE"):
        return
    try:
        if jax.default_backend() != "tpu":
            # CPU artifacts from the remote-compile service can carry
            # unsupported machine features (SIGILL risk on load); only
            # the TPU path benefits from persistence.
            return
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
    except Exception:  # pragma: no cover
        pass


class Stage(Enum):
    """Current stage of the experiment."""

    TRAIN = auto()
    VALID = auto()
    TEST = auto()


def create_experiment_directory(
    experiment_directory,
    hyperparams_to_save=None,
    overrides={},
    log_config=DEFAULT_LOG_CONFIG,
    save_env_desc=True,
):
    """Create the output folder (main process only) and log basics."""
    from speechbrain_tpu.utils.logger import (
        get_environment_description,
        setup_logging,
    )

    # The recipe script that called us — captured here (not inside
    # create_and_log, whose caller is run_on_main) so the copy
    # archives the actual train script (reference ``core.py:95``).
    calling_module = inspect.getmodule(inspect.currentframe().f_back)

    def create_and_log():
        os.makedirs(experiment_directory, exist_ok=True)
        if hyperparams_to_save is not None:
            from speechbrain_tpu.utils.hyperyaml import resolve_references

            hparams_filename = os.path.join(
                experiment_directory, "hyperparams.yaml"
            )
            with open(hyperparams_to_save) as f:
                resolved_yaml = resolve_references(f, overrides)
            with open(hparams_filename, "w") as w:
                print("# Generated %s from:" % time.ctime(), file=w)
                print("# %s" % os.path.abspath(hyperparams_to_save), file=w)
                print("# yamllint disable", file=w)
                w.write(resolved_yaml.getvalue())
        if calling_module is not None and hasattr(
            calling_module, "__file__"
        ):
            callingfile = os.path.realpath(calling_module.__file__)
            import shutil

            try:
                shutil.copy(
                    callingfile,
                    os.path.join(
                        experiment_directory, os.path.basename(callingfile)
                    ),
                )
            except shutil.SameFileError:
                pass
        log_file = os.path.join(experiment_directory, "log.txt")
        logger_overrides = {
            "handlers": {
                "file_handler": {
                    "class": "logging.FileHandler",
                    "level": "DEBUG",
                    "formatter": "simple",
                    "filename": log_file,
                }
            },
            "root": {"handlers": ["console", "file_handler"]},
        }
        setup_logging(overrides=logger_overrides)
        sys.excepthook = _logging_excepthook
        if save_env_desc:
            with open(
                os.path.join(experiment_directory, "env.log"), "w"
            ) as f:
                f.write(get_environment_description())

    run_on_main(create_and_log)


def _logging_excepthook(exc_type, exc_value, exc_traceback):
    logger.error("Exception:", exc_info=(exc_type, exc_value, exc_traceback))
    sys.__excepthook__(exc_type, exc_value, exc_traceback)


def parse_arguments(arg_list=None):
    """CLI parsing: param_file + run opts; extra --key val become YAML
    overrides (reference ``core.py:131``).

    Returns (param_file, run_opts dict, overrides yaml string).
    """
    if arg_list is None:
        arg_list = sys.argv[1:]
    parser = argparse.ArgumentParser(description="Run a SpeechBrain-TPU experiment")
    parser.add_argument("param_file", type=str)
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--debug_batches", type=int, default=2)
    parser.add_argument("--debug_epochs", type=int, default=2)
    parser.add_argument("--log_config", type=str)
    parser.add_argument("--seed", type=int, default=None)
    # NOTE: data_folder / output_folder are NOT run-opts: like the
    # reference (core.py:131), they pass through as YAML overrides.
    parser.add_argument("--find_unused_parameters", action="store_true")
    parser.add_argument("--jit_module_keys", type=str, nargs="*")
    parser.add_argument("--precision", type=str, choices=["fp32", "bf16"])
    parser.add_argument("--auto_mix_prec", action="store_true", default=None)
    parser.add_argument("--num_workers", type=int)
    parser.add_argument("--grad_accumulation_factor", type=int)
    parser.add_argument("--optimizer_step_limit", type=int)
    parser.add_argument("--max_grad_norm", type=float)
    parser.add_argument("--nonfinite_patience", type=int)
    parser.add_argument("--ckpt_interval_minutes", type=float)
    parser.add_argument("--model_parallel", type=int)
    parser.add_argument("--loss_sync_interval", type=int)
    parser.add_argument("--steps_per_execute", type=int)
    parser.add_argument("--staging_depth", type=int)
    parser.add_argument("--coordinator_address", type=str)
    parser.add_argument("--num_processes", type=int)
    parser.add_argument("--process_id", type=int)
    run_opts, overrides_list = parser.parse_known_args(arg_list)
    run_opts = {
        k: v for k, v in vars(run_opts).items() if v is not None
    }
    param_file = run_opts.pop("param_file")
    overrides = _convert_to_yaml(overrides_list)
    return param_file, run_opts, overrides


def _convert_to_yaml(overrides):
    """["--foo", "1", "--bar=x"] -> "foo: 1\\nbar: x"."""
    yaml_string = ""
    joined = " ".join(overrides)
    for element in joined.split(" --"):
        element = element.replace("--", "")
        if "=" in element:
            k, v = element.split("=", 1)
            yaml_string += f"{k}: {v}\n"
        elif " " in element:
            k, v = element.split(" ", 1)
            yaml_string += f"{k}: {v}\n"
    return yaml_string.strip()


class _BoundModules:
    """Attribute access to modules with params/state/rngs bound."""

    def __init__(self, brain):
        object.__setattr__(self, "_brain", brain)

    def __getattr__(self, name):
        brain = object.__getattribute__(self, "_brain")
        if name not in brain._module_defs:
            raise AttributeError(f"No module named {name}")
        return functools.partial(brain._call_module, name)

    def __contains__(self, name):
        return name in object.__getattribute__(self, "_brain")._module_defs

    def keys(self):
        """Available keys."""
        return object.__getattribute__(self, "_brain")._module_defs.keys()


def _accepts_kwarg(fn, kwarg):
    try:
        return kwarg in inspect.signature(fn).parameters
    except (TypeError, ValueError):  # pragma: no cover
        return False


@register_checkpoint_hooks
class Brain:
    """Training/evaluation engine.  Subclass and override
    ``compute_forward(batch, stage)`` and
    ``compute_objectives(predictions, batch, stage)``.

    Arguments
    ---------
    modules : dict[str, flax.linen.Module]
    opt_class : callable(learning_rate) -> optax.GradientTransformation
    hparams : dict
        Exposed as ``self.hparams.<key>``.
    run_opts : dict
        Engine options (debug, grad_accumulation_factor, max_grad_norm,
        nonfinite_patience, precision, ckpt_interval_minutes, seed...).
    checkpointer : Checkpointer, optional
        The Brain registers its state + counters with it.
    """

    def __init__(
        self,
        modules=None,
        opt_class=None,
        hparams=None,
        run_opts=None,
        checkpointer=None,
    ):
        self.opt_class = opt_class
        self.checkpointer = checkpointer
        self._module_defs = dict(modules or {})
        self.modules = _BoundModules(self)
        run_opts = run_opts or {}
        run_opt_defaults = {
            "debug": False,
            "debug_batches": 2,
            "debug_epochs": 2,
            "precision": "fp32",
            "seed": 1234,
            "grad_accumulation_factor": 1,
            "optimizer_step_limit": None,
            "max_grad_norm": 5.0,
            "nonfinite_patience": 3,
            "ckpt_interval_minutes": 0,
            "model_parallel": 1,
            "noprogressbar": False,
            # Host<->device sync cadence for the training loss.  1 =
            # reference behaviour (sync every step); larger values keep
            # the dispatch queue full — essential when the device sits
            # behind a high-latency link, and generally free throughput.
            "loss_sync_interval": 10,
            # Fused multi-step execution: scan this many same-shape
            # batches inside ONE jitted call (the classic TPU
            # steps-per-loop idiom).  Amortizes per-dispatch host
            # latency; 1 = reference behaviour (one program per batch).
            "steps_per_execute": 1,
            # Overlapped host->device staging: a background thread
            # runs prepare_batch (pad + async device_put) on batch
            # N+1..N+depth while batch N computes — the TPU
            # role-equivalent of the reference's pin_memory +
            # non_blocking H2D (dataio/batch.py:161, core.py:693).
            # 0 disables (reference behaviour: synchronous staging
            # inline in fit_batch).
            "staging_depth": 2,
        }
        for arg, default in run_opt_defaults.items():
            if arg in run_opts:
                setattr(self, arg, run_opts[arg])
            elif hparams is not None and arg in hparams:
                setattr(self, arg, hparams[arg])
            else:
                setattr(self, arg, default)
        if hparams is not None:
            self.hparams = SimpleNamespace(**hparams)
        else:
            self.hparams = SimpleNamespace()

        _enable_compile_cache()
        self.mesh = make_mesh(model_parallel=self.model_parallel)
        self.avg_train_loss = 0.0
        self.step = 0
        self.optimizer_step = 0
        self.nonfinite_count = 0
        self.train_state = None  # dict pytree once initialized
        self.optimizer = None
        self.lr = getattr(self.hparams, "lr", 1e-3)
        self._rng = make_prng_key(self.seed)
        # Per-trace binding slots (set during a traced step):
        self._bound_params = None
        self._bound_state = None
        self._bound_rngs = None
        self._bound_train = False
        self._mutable_updates = None
        self._init_mode = False
        self._init_collected = None
        self._new_extra = None
        self._accum_grads = None
        self._pending_losses = []
        self._synced_loss_sum = 0.0
        self._synced_loss_count = 0
        self._jit_cache = {}
        self._last_ckpt_time = time.time()
        if self.checkpointer is not None:
            self.checkpointer.add_recoverable("brain", self)

    # ------------------------------------------------------------------
    # User overrides
    # ------------------------------------------------------------------

    def compute_forward(self, batch, stage):
        """Forward pass: batch dict -> predictions (pytree)."""
        raise NotImplementedError

    def compute_objectives(self, predictions, batch, stage):
        """Loss computation: -> scalar loss (or (loss, aux_dict))."""
        raise NotImplementedError

    def on_stage_start(self, stage, epoch=None):
        """Called at the start of each TRAIN/VALID/TEST stage."""

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Called at the end of each stage with the average loss."""

    def on_fit_start(self):
        """Called once before training; recovers checkpoints."""
        self.init_optimizers()
        if self.checkpointer is not None:
            # Remember WHICH checkpoint was recovered: the train state
            # is a lazily-initialized recoverable (params come from the
            # first batch), so _ensure_initialized must replay this
            # checkpoint's train_state file after registering it —
            # otherwise a fresh process recovers its counters but
            # silently trains from scratch parameters (caught by the
            # round-3 kill/resume dress rehearsal).
            self._recovered_ckpt = self.checkpointer.recover_if_possible()

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        """Called after each train batch (host side)."""

    def on_evaluate_start(self, max_key=None, min_key=None):
        """Called at evaluate() start: recover best checkpoint."""
        if self.checkpointer is not None:
            self._recovered_ckpt = self.checkpointer.recover_if_possible(
                max_key=max_key, min_key=min_key
            )

    def init_optimizers(self):
        """Build the optax chain (clip + opt) with injectable lr."""
        if self.opt_class is None:
            return
        clip = self.max_grad_norm

        def factory(learning_rate):
            parts = []
            if clip is not None and clip > 0:
                parts.append(optax.clip_by_global_norm(clip))
            parts.append(self.opt_class(learning_rate))
            return optax.chain(*parts)

        self.optimizer = optax.inject_hyperparams(factory)(
            learning_rate=self.lr
        )

    # ------------------------------------------------------------------
    # Module binding (init/apply routing)
    # ------------------------------------------------------------------

    def _call_module(self, name, *args, **kwargs):
        module = self._module_defs[name]
        method = kwargs.pop("method", None)
        call_fn = (
            getattr(type(module), method) if method else type(module).__call__
        )
        if _accepts_kwarg(call_fn, "train") and "train" not in kwargs:
            kwargs["train"] = self._bound_train
        if self._init_mode:
            rngs = dict(self._bound_rngs or {})
            rngs.setdefault("params", self._next_rng())
            out, variables = module.init_with_output(
                rngs, *args, method=method, **kwargs
            )
            variables = dict(variables)
            params = variables.pop("params", {})
            # A module may be traced through several methods during
            # init (e.g. encode-only in compute_forward, full
            # __call__ elsewhere); merge the param trees, keeping
            # earlier entries (same submodule → same init).
            prev = self._init_collected["params"].get(name)
            if prev is not None:
                params = {**params, **prev}
            self._init_collected["params"][name] = params
            if variables:
                prev_state = self._init_collected["state"].get(name)
                if prev_state is not None:
                    variables = {**variables, **prev_state}
                self._init_collected["state"][name] = variables
            return out
        if method is not None:
            variables = {"params": self._bound_params[name]}
            variables.update((self._bound_state or {}).get(name, {}))
            return module.apply(
                variables, *args, rngs=self._bound_rngs,
                method=method, **kwargs,
            )
        variables = {"params": self._bound_params[name]}
        state_cols = (self._bound_state or {}).get(name, {})
        variables.update(state_cols)
        mutable = [k for k in state_cols.keys()] if self._bound_train else False
        if mutable:
            out, updates = module.apply(
                variables, *args, rngs=self._bound_rngs, mutable=mutable, **kwargs
            )
            self._mutable_updates[name] = dict(updates)
            return out
        return module.apply(
            variables, *args, rngs=self._bound_rngs, **kwargs
        )

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _make_step_rngs(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "dropout": k1, "gumbel": k2, "augment": k3, "noise": k4,
        }

    # ------------------------------------------------------------------
    # Initialization (lazy, from the first batch)
    # ------------------------------------------------------------------

    def _ensure_initialized(self, batch):
        if self.train_state is not None:
            return
        logger.info("Initializing parameters from the first batch")
        self._init_mode = True
        self._init_collected = {"params": {}, "state": {}}
        self._bound_train = False
        self._bound_rngs = self._make_step_rngs(self._next_rng())
        # Bind extra state up-front so compute_forward can read
        # self._bound_extra (e.g. InputNormalization stats) during the
        # lazy-init trace, exactly as it does inside the jitted step.
        extra = self.init_extra_state(batch)
        self._bound_extra = extra
        try:
            predictions = self.compute_forward(batch, Stage.TRAIN)
            # Hook for subclasses whose losses touch modules the
            # forward pass does not (e.g. GAN discriminators).
            self.init_trace_extra(batch, predictions)
        finally:
            self._init_mode = False
            self._new_extra = None
        params = self._init_collected["params"]
        model_state = self._init_collected["state"]
        if self.optimizer is None:
            self.init_optimizers()
        opt_state = (
            self.optimizer.init(params) if self.optimizer is not None else ()
        )
        state = {
            "params": params,
            "model_state": model_state,
            "opt_state": opt_state,
            "extra": extra,
        }
        self.train_state = place_state(self.mesh, state)
        n_params = sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(params)
        )
        logger.info(f"{n_params / 1e6:.2f}M trainable parameters")
        if self.checkpointer is not None:
            self._state_recoverable = _TrainStateRecoverable(self)
            self.checkpointer.add_recoverable(
                "train_state", self._state_recoverable
            )
            # Replay the already-recovered checkpoint's train state
            # over the freshly initialized one (lazy init runs AFTER
            # on_fit_start's recover_if_possible; see on_fit_start).
            ckpt = getattr(self, "_recovered_ckpt", None)
            if ckpt is not None:
                from speechbrain_tpu.utils.checkpoints import (
                    DEFAULT_LOAD_HOOKS,
                    get_default_hook,
                )

                loadpath = ckpt.path / "train_state.ckpt"
                if loadpath.exists():
                    hook = get_default_hook(
                        self._state_recoverable, DEFAULT_LOAD_HOOKS
                    )
                    hook(
                        self._state_recoverable,
                        loadpath,
                        ckpt.meta["end-of-epoch"],
                    )
                    logger.info(
                        "Restored train state from "
                        f"{ckpt.path.name} over the fresh init"
                    )

    def init_extra_state(self, batch):
        """Override: extra mutable state (e.g. InputNormalization stats)."""
        return {}

    def init_trace_extra(self, batch, predictions):
        """Override: trace additional modules during lazy init (modules
        only reached from the loss, e.g. GAN discriminators)."""

    # ------------------------------------------------------------------
    # Jitted steps
    # ------------------------------------------------------------------

    def _bind(self, params, model_state, extra, rngs, train):
        self._bound_params = params
        self._bound_state = model_state
        self._bound_extra = extra
        self._bound_rngs = rngs
        self._bound_train = train
        self._mutable_updates = {}

    def _loss_fn(self, params, model_state, extra, batch, rngs, stage):
        self._bind(params, model_state, extra, rngs, train=(stage == Stage.TRAIN))
        predictions = self.compute_forward(batch, stage)
        result = self.compute_objectives(predictions, batch, stage)
        if isinstance(result, tuple):
            loss, aux = result
        else:
            loss, aux = result, {}
        new_model_state = dict(model_state)
        for name, updates in self._mutable_updates.items():
            merged = dict(new_model_state.get(name, {}))
            merged.update(updates)
            new_model_state[name] = merged
        new_extra = getattr(self, "_new_extra", None) or extra
        self._new_extra = None
        return loss, (aux, new_model_state, new_extra)

    def _train_step(self, state, batch, rng, lr):
        rngs = self._make_step_rngs(rng)
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
        (loss, (aux, model_state, extra)), grads = grad_fn(
            state["params"], state["model_state"], state["extra"],
            batch, rngs, Stage.TRAIN,
        )
        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        opt_state = state["opt_state"]
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, dtype=opt_state.hyperparams["learning_rate"].dtype
        )
        updates, new_opt_state = self.optimizer.update(
            grads, opt_state, state["params"]
        )
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": new_params,
            "model_state": model_state,
            "opt_state": new_opt_state,
            "extra": extra,
        }
        return new_state, loss

    def _train_steps(self, state, batch_list, window_seed, lrs):
        """K fused train steps: ``lax.scan`` of ``_train_step`` over a
        same-shape batch window.  One dispatch per K steps.

        Window stacking and ALL key derivation happen INSIDE the jitted
        program (the window key is ``fold_in(base, window_counter)``
        from a host integer): on a high-latency dispatch link every
        extra host-side device op (a stack per leaf, a key split) costs
        a full round trip, which is exactly what this path exists to
        amortize.
        """
        window = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *batch_list
        )
        rng = jax.random.fold_in(make_prng_key(self.seed), window_seed)
        rngs = jax.random.split(rng, len(batch_list))
        lrs = jnp.asarray(lrs, dtype=jnp.float32)

        def body(state, xs):
            batch, step_rng, lr = xs
            return self._train_step(state, batch, step_rng, lr)

        return jax.lax.scan(body, state, (window, rngs, lrs))

    def _grad_step(self, state, batch, rng):
        """Gradient-only step (for accumulation)."""
        rngs = self._make_step_rngs(rng)
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
        (loss, (aux, model_state, extra)), grads = grad_fn(
            state["params"], state["model_state"], state["extra"],
            batch, rngs, Stage.TRAIN,
        )
        return grads, loss, model_state, extra

    def _apply_grads(self, state, grads, lr):
        finite = jnp.isfinite(
            sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads))
        )
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        opt_state = state["opt_state"]
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, dtype=opt_state.hyperparams["learning_rate"].dtype
        )
        updates, new_opt_state = self.optimizer.update(
            grads, opt_state, state["params"]
        )
        new_params = optax.apply_updates(state["params"], updates)
        return {**state, "params": new_params, "opt_state": new_opt_state}

    def _eval_step(self, state, batch, rng, stage):
        rngs = self._make_step_rngs(rng)
        loss, (aux, _, _) = self._loss_fn(
            state["params"], state["model_state"], state["extra"],
            batch, rngs, stage,
        )
        return loss, aux

    def _get_jitted(self, kind):
        # host_traced_jit = jax.jit semantics with traces running under
        # a cpu default_device, so trace-time closure constants stay
        # host-side — behind remote-dispatch TPU links, MLIR lowering
        # otherwise fetches each device constant with a blocking
        # device_get (minutes per program; utils/aot.py).
        from speechbrain_tpu.utils.aot import host_traced_jit

        if kind not in self._jit_cache:
            if kind == "train":
                self._jit_cache[kind] = host_traced_jit(
                    self._train_step, donate_argnums=(0,)
                )
            elif kind == "train_scan":
                self._jit_cache[kind] = host_traced_jit(
                    self._train_steps, donate_argnums=(0,)
                )
            elif kind == "grad":
                self._jit_cache[kind] = host_traced_jit(self._grad_step)
            elif kind == "apply":
                self._jit_cache[kind] = host_traced_jit(
                    self._apply_grads, donate_argnums=(0, 1)
                )
            elif kind == "valid":
                self._jit_cache[kind] = host_traced_jit(
                    functools.partial(self._eval_step, stage=Stage.VALID)
                )
            elif kind == "test":
                self._jit_cache[kind] = host_traced_jit(
                    functools.partial(self._eval_step, stage=Stage.TEST)
                )
        return self._jit_cache[kind]

    # ------------------------------------------------------------------
    # Batch handling
    # ------------------------------------------------------------------

    def prepare_batch(self, batch):
        """PaddedBatch/host dict -> device-sharded numeric dict.

        If the batch dim does not divide the data-parallel axis, dummy
        rows are appended and a ``batch_mask`` key (1 real / 0 dummy)
        is added.  Losses follow the masked-length convention, so dummy
        rows contribute nothing (pass ``length=batch["batch_mask"]`` to
        per-example losses that take no sequence length).

        Dummy rows are CYCLIC REPLICAS of the real rows, not zeros:
        batch-coupled statistics (BatchNorm batch stats,
        InputNormalization updates) then see each real row repeated —
        exactly the real-row statistics when the pad count is a
        multiple of the real batch, and a mild reweighting otherwise —
        instead of being dragged toward silence by all-zero rows.  The
        reference never pads rows (ragged DynamicBatchSampler batches),
        so neutral padding is what preserves its semantics.
        """
        if isinstance(batch, PaddedBatch):
            numeric = batch.numeric_dict()
        elif isinstance(batch, dict):
            numeric = {
                k: v
                for k, v in batch.items()
                if isinstance(v, (np.ndarray, jnp.ndarray))
            }
        else:
            raise TypeError(f"Cannot prepare batch of type {type(batch)}")
        n_shards = self.mesh.shape["data"]
        if jax.process_count() > 1:
            # multi-process: the batch here is this host's LOCAL shard
            # (see parallel.sharding.shard_batch); pad to the local
            # slice of the data axis.
            n_shards = max(1, n_shards // jax.process_count())
        sizes = {v.shape[0] for v in numeric.values() if hasattr(v, "shape") and v.ndim > 0}
        if len(sizes) == 1:
            B = sizes.pop()
            remainder = B % n_shards
            if remainder:
                pad_n = n_shards - remainder
                pad_idx = np.arange(pad_n) % B
                padded = {}
                for k, v in numeric.items():
                    v = np.asarray(v)
                    padded[k] = np.concatenate([v, v[pad_idx]])
                existing = numeric.get(
                    "batch_mask", np.ones(B, np.float32)
                )
                padded["batch_mask"] = np.concatenate(
                    [
                        np.asarray(existing, np.float32),
                        np.zeros(pad_n, np.float32),
                    ]
                )
                numeric = padded
            elif "batch_mask" not in numeric:
                numeric["batch_mask"] = np.ones(B, np.float32)
        return shard_batch(self.mesh, numeric)

    def fit_batch(self, batch):
        """One training batch; returns the loss.

        The returned value is a DEVICE scalar between sync points and a
        python float on every ``loss_sync_interval``-th step — dispatch
        stays asynchronous so transfers/steps pipeline (critical when
        the device is behind a high-latency link; the reference's
        per-step ``.detach()`` sync costs nothing on a local GPU but
        multiplies step time here).  Nonfinite-loss patience is applied
        at each sync over the whole synced window.
        """
        device_batch = self.prepare_batch(batch)
        self._ensure_initialized(device_batch)
        rng = self._next_rng()
        should_step = self.step % self.grad_accumulation_factor == 0
        if self.grad_accumulation_factor == 1:
            self.train_state, loss = self._get_jitted("train")(
                self.train_state, device_batch, rng, self.lr
            )
            self.optimizer_step += 1
        else:
            grads, loss, model_state, extra = self._get_jitted("grad")(
                self.train_state, device_batch, rng
            )
            self.train_state["model_state"] = model_state
            self.train_state["extra"] = extra
            scale = 1.0 / self.grad_accumulation_factor
            scaled = jax.tree_util.tree_map(lambda g: g * scale, grads)
            if self._accum_grads is None:
                self._accum_grads = scaled
            else:
                self._accum_grads = jax.tree_util.tree_map(
                    jnp.add, self._accum_grads, scaled
                )
            if self.step % self.grad_accumulation_factor == 0:
                self.train_state = self._get_jitted("apply")(
                    self.train_state, self._accum_grads, self.lr
                )
                self._accum_grads = None
                self.optimizer_step += 1
        self._pending_losses.append(loss)
        sync_every = max(1, int(self.loss_sync_interval))
        if len(self._pending_losses) >= sync_every:
            loss = self._sync_losses()
        self.on_fit_batch_end(batch, None, loss, should_step)
        return loss

    def fit_batches(self, batches):
        """K same-shape training batches fused into ONE jitted dispatch.

        The classic TPU *steps-per-loop* idiom: the window is stacked on
        a leading scan axis and ``lax.scan`` runs ``_train_step`` K
        times on-device, so per-call host dispatch latency (arg/result
        handle marshaling — ~10 ms/call through a remote-dispatch
        link, ~100 us locally) is paid once per window instead of once
        per batch.  Device work is identical to K ``fit_batch`` calls.

        Semantics vs per-step fit_batch: the learning rate is sampled
        once at window start (per-batch ``on_fit_batch_end`` scheduler
        updates apply between windows), per-step PRNG keys are
        ``split(window_key, K)`` instead of the sequential split chain
        (a different but equally independent stream), and losses join
        the lazy sync queue as a (K,) device vector.  Requires
        ``grad_accumulation_factor == 1``.

        Arguments
        ---------
        batches : list
            K batches with identical array shapes (one bucket), host or
            already-prepared.

        Returns
        -------
        The (K,) device loss vector for the window.
        """
        if self.grad_accumulation_factor != 1:
            raise ValueError(
                "fit_batches requires grad_accumulation_factor == 1; "
                "use fit_batch for accumulation."
            )
        device_batches = [self.prepare_batch(b) for b in batches]
        self._ensure_initialized(device_batches[0])
        K = len(device_batches)
        lrs = np.full((K,), self.lr, dtype=np.float32)
        self._window_counter = getattr(self, "_window_counter", 0) + 1
        self.train_state, losses = self._get_jitted("train_scan")(
            self.train_state,
            device_batches,
            np.uint32(self._window_counter),
            lrs,
        )
        self.optimizer_step += K
        self._pending_losses.append(losses)
        sync_every = max(1, int(self.loss_sync_interval))
        last = losses  # device vector between sync points (stay async)
        pending_steps = sum(
            int(np.prod(l.shape)) if getattr(l, "shape", ()) else 1
            for l in self._pending_losses
        )
        if pending_steps >= sync_every:
            last = self._sync_losses()
        self.on_fit_batch_end(batches[-1], None, last, True)
        return losses

    def _sync_losses(self):
        """Fetch pending device losses; update averages + nonfinite
        patience.  Returns the last loss as float (or None if empty).
        Entries may be scalars (fit_batch) or (K,) windows
        (fit_batches)."""
        if not self._pending_losses:
            return None
        vals = [
            float(v)
            for arr in jax.device_get(self._pending_losses)
            for v in np.ravel(arr)
        ]
        self._pending_losses = []
        last = vals[-1]
        for v in vals:
            if np.isfinite(v):
                self._synced_loss_sum += v
                self._synced_loss_count += 1
            else:
                self.nonfinite_count += 1
                logger.warning(
                    f"Loss is {v}; "
                    f"({self.nonfinite_count}/{self.nonfinite_patience})"
                )
                if self.nonfinite_count > self.nonfinite_patience:
                    raise ValueError(
                        "Loss is not finite and patience is exhausted."
                    )
        if self._synced_loss_count:
            self.avg_train_loss = (
                self._synced_loss_sum / self._synced_loss_count
            )
        return last

    def evaluate_batch(self, batch, stage):
        """One evaluation batch (loss only, jitted)."""
        device_batch = self.prepare_batch(batch)
        self._ensure_initialized(device_batch)
        rng = self._next_rng()
        kind = "valid" if stage == Stage.VALID else "test"
        loss, aux = self._get_jitted(kind)(
            self.train_state, device_batch, rng
        )
        return float(loss)

    def evaluate_batch_full(self, batch, stage):
        """Eager evaluation: runs forward + objectives OUTSIDE jit so
        recipes can update host-side metric trackers (ErrorRateStats)
        within compute_objectives, mirroring the reference pattern."""
        device_batch = self.prepare_batch(batch)
        self._ensure_initialized(device_batch)
        rngs = self._make_step_rngs(self._next_rng())
        self._bind(
            self.train_state["params"],
            self.train_state["model_state"],
            self.train_state["extra"],
            rngs,
            train=False,
        )
        predictions = self.compute_forward(device_batch, stage)
        result = self.compute_objectives(predictions, device_batch, stage)
        loss = result[0] if isinstance(result, tuple) else result
        return float(loss)

    # ------------------------------------------------------------------
    # Fit / evaluate loops
    # ------------------------------------------------------------------

    def make_dataloader(self, dataset, stage, **loader_kwargs):
        """Build a loader; override for custom sampling."""
        if isinstance(dataset, (DataLoader, LoopedLoader)):
            return dataset
        return make_dataloader(dataset, **loader_kwargs)

    def fit(
        self,
        epoch_counter,
        train_set,
        valid_set=None,
        progressbar=None,
        train_loader_kwargs={},
        valid_loader_kwargs={},
    ):
        """Epoch loop over fit_batch/evaluate_batch with stage hooks."""
        train_set = self.make_dataloader(
            train_set, Stage.TRAIN, **train_loader_kwargs
        )
        if valid_set is not None:
            valid_set = self.make_dataloader(
                valid_set, Stage.VALID, **valid_loader_kwargs
            )
        from speechbrain_tpu.dataio.dataloader import (
            SaveableStreamLoader,
        )

        if (
            self.checkpointer is not None
            and isinstance(
                train_set, (SaveableDataLoader, SaveableStreamLoader)
            )
            and "train_loader" not in self.checkpointer.recoverables
        ):
            self.checkpointer.add_recoverable("train_loader", train_set)
        # Auto-register the epoch counter: without it a killed run
        # recovers its parameters but restarts at epoch 1 (caught by
        # the round-3 kill/resume dress rehearsal).  The reference
        # relies on every recipe yaml listing the counter in the
        # checkpointer's recoverables; registering here covers recipes
        # that pass a counter straight to fit().
        from speechbrain_tpu.utils.epoch_loop import EpochCounter

        if (
            self.checkpointer is not None
            and isinstance(epoch_counter, EpochCounter)
            and "epoch_counter" not in self.checkpointer.recoverables
        ):
            self.checkpointer.add_recoverable(
                "epoch_counter", epoch_counter
            )
        self._accum_grads = None
        self.on_fit_start()
        progressbar = (
            not self.noprogressbar if progressbar is None else progressbar
        )
        for epoch in epoch_counter:
            self._fit_train(train_set, epoch, progressbar)
            self._fit_valid(valid_set, epoch, progressbar)
            if (
                self.optimizer_step_limit is not None
                and self.optimizer_step >= self.optimizer_step_limit
            ):
                logger.info("Optimizer step limit reached; stopping fit")
                break
            if self.debug and epoch >= self.debug_epochs:
                logger.info("Debug mode: stopping after debug epochs")
                break

    def _staged_iter(self, iterator, loader=None):
        """Double-buffered device staging (reference pin_memory role).

        A daemon thread pulls host batches and runs ``prepare_batch``
        (pad + device_put) up to ``staging_depth`` batches ahead of
        the training loop, so the H2D transfer of batch N+1 overlaps
        batch N's compute.  Yields ``(device_batch, host_batch)`` in
        order; the host batch is kept for the ``on_fit_batch_end``
        hook.  Exceptions propagate to the consumer.

        Checkpoint discipline: the stager advances the underlying
        SaveableDataLoader's position counter up to ``staging_depth``
        batches AHEAD of training, so the CONSUMED position (captured
        at stage time, published on yield) is handed to the loader as
        ``_speechbrain_staged_position`` — what its saver records —
        keeping mid-epoch resume exact.
        """
        import queue as _queue

        q = _queue.Queue(maxsize=max(1, int(self.staging_depth)))
        SENTINEL = object()

        def stager():
            try:
                while True:
                    try:
                        batch = next(iterator)
                    except StopIteration:
                        break
                    pos = getattr(
                        loader, "_speechbrain_iterator_position", None
                    )
                    q.put((self.prepare_batch(batch), batch, pos))
            except Exception as e:
                q.put(e)
                return
            q.put(SENTINEL)

        t = threading.Thread(target=stager, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, Exception):
                    raise item
                device_batch, host_batch, pos = item
                if loader is not None:
                    loader._speechbrain_staged_position = pos
                yield device_batch, host_batch
        finally:
            if loader is not None:
                loader._speechbrain_staged_position = None

    def _fit_train(self, train_set, epoch, progressbar):
        self.on_stage_start(Stage.TRAIN, epoch)
        if hasattr(train_set, "sampler") and hasattr(
            train_set.sampler, "set_epoch"
        ):
            train_set.sampler.set_epoch(epoch)
        if hasattr(train_set, "batch_sampler") and hasattr(
            train_set.batch_sampler, "set_epoch"
        ):
            train_set.batch_sampler.set_epoch(epoch)
        self.avg_train_loss = 0.0
        self._synced_loss_sum = 0.0
        self._synced_loss_count = 0
        self._pending_losses = []
        use_staging = int(getattr(self, "staging_depth", 0) or 0) > 0
        source = (
            self._staged_iter(iter(train_set), train_set)
            if use_staging
            else train_set
        )
        iterator = source
        if progressbar:
            from tqdm import tqdm

            iterator = tqdm(
                source,
                total=len(train_set) if hasattr(train_set, "__len__") else None,
                dynamic_ncols=True,
                disable=not if_main_process(),
            )
        spe = max(1, int(getattr(self, "steps_per_execute", 1) or 1))
        fused = (
            spe > 1
            and self.grad_accumulation_factor == 1
            and type(self).fit_batch is Brain.fit_batch
        )
        window, window_key = [], None

        def _flush_window():
            nonlocal window, window_key
            if window:
                self.step += len(window)
                self.fit_batches(window)
                window, window_key = [], None

        for item in iterator:
            # staged iterator yields (device_batch, host_batch); the
            # device batch feeds the step (prepare_batch no-ops on
            # already-placed arrays)
            batch = item[0] if use_staging else item
            if fused:
                prepared = self.prepare_batch(batch)
                key = tuple(
                    sorted(
                        (k, v.shape, str(v.dtype))
                        for k, v in prepared.items()
                    )
                )
                if window and key != window_key:
                    _flush_window()  # bucket shape changed mid-window
                window.append(prepared)
                window_key = key
                if len(window) < spe and not (
                    self.debug and self.step + len(window) >= self.debug_batches
                ):
                    continue
                _flush_window()
            else:
                self.step += 1
                loss = self.fit_batch(batch)
                if progressbar and isinstance(loss, float):
                    iterator.set_postfix(train_loss=self.avg_train_loss)
            if (
                self.checkpointer is not None
                and self.ckpt_interval_minutes > 0
                and time.time() - self._last_ckpt_time
                >= self.ckpt_interval_minutes * 60.0
            ):
                self._save_intra_epoch_ckpt()
            if self.debug and self.step >= self.debug_batches:
                break
        _flush_window()
        self._sync_losses()  # drain the tail of the pipeline
        self.on_stage_end(Stage.TRAIN, self.avg_train_loss, epoch)
        self.train_loss = self.avg_train_loss
        self.step = 0

    def _fit_valid(self, valid_set, epoch, progressbar):
        if valid_set is None:
            return
        self.on_stage_start(Stage.VALID, epoch)
        avg_valid_loss = 0.0
        step = 0
        for batch in valid_set:
            step += 1
            loss = self.evaluate_batch_full(batch, Stage.VALID)
            avg_valid_loss += (loss - avg_valid_loss) / step
            if self.debug and step >= self.debug_batches:
                break
        run_on_main(
            self.on_stage_end,
            args=[Stage.VALID, avg_valid_loss, epoch],
        )

    def evaluate(
        self,
        test_set,
        max_key=None,
        min_key=None,
        progressbar=None,
        test_loader_kwargs={},
    ):
        """Run TEST stage; returns average loss."""
        test_set = self.make_dataloader(
            test_set, Stage.TEST, **test_loader_kwargs
        )
        self.on_evaluate_start(max_key=max_key, min_key=min_key)
        self.on_stage_start(Stage.TEST, epoch=None)
        avg_test_loss = 0.0
        step = 0
        for batch in test_set:
            step += 1
            loss = self.evaluate_batch_full(batch, Stage.TEST)
            avg_test_loss += (loss - avg_test_loss) / step
            if self.debug and step >= self.debug_batches:
                break
        run_on_main(
            self.on_stage_end, args=[Stage.TEST, avg_test_loss, None]
        )
        self.step = 0
        return avg_test_loss

    def update_average(self, loss, avg_loss):
        """Streaming average that ignores nonfinite values."""
        if np.isfinite(loss):
            avg_loss -= avg_loss / self.step
            avg_loss += loss / self.step
        return avg_loss

    def _save_intra_epoch_ckpt(self):
        self._last_ckpt_time = time.time()
        self.checkpointer.save_and_keep_only(
            end_of_epoch=False,
            num_to_keep=1,
            ckpt_predicate=lambda c: INTRA_EPOCH_CKPT_FLAG in c.meta,
            meta={INTRA_EPOCH_CKPT_FLAG: True},
            verbosity=logging.DEBUG,
        )

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------

    @mark_as_saver
    def _save(self, path):
        save_dict = {
            "step": self.step,
            "optimizer_step": self.optimizer_step,
            "avg_train_loss": self.avg_train_loss,
            "lr": float(self.lr),
        }
        import json

        with open(path, "w") as w:
            json.dump(save_dict, w)

    @mark_as_loader
    def _recover(self, path, end_of_epoch=True):
        import json

        with open(path) as f:
            save_dict = json.load(f)
        self.step = save_dict["step"]
        self.optimizer_step = save_dict["optimizer_step"]
        self.avg_train_loss = save_dict["avg_train_loss"]
        self.lr = save_dict.get("lr", self.lr)
        if end_of_epoch:
            self.step = 0


class _TrainStateRecoverable(Recoverable):
    """Checkpoints the Brain's TrainState pytree by reference."""

    def __init__(self, brain):
        self.brain = brain

    @property
    def value(self):
        """Current recoverable value."""
        return jax.device_get(self.brain.train_state)

    @value.setter
    def value(self, new):
        """Current recoverable value."""
        self.brain.train_state = place_state(self.brain.mesh, new)
