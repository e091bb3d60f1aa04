"""Adversarial training engine: a Brain with generator/discriminator
optimizers in ONE jitted step.

Parity target: the reference's GAN recipes (HiFiGAN
``recipes/LJSpeech/TTS/vocoder/hifi_gan/train.py:74`` fit_batch,
MetricGAN, SEGAN) override ``fit_batch`` with two torch optimizers and
two backward passes.  The TPU-native design fuses both updates into a
single XLA program: discriminator grads w.r.t. its param slice (the
generator forward is recomputed but not differentiated), then generator
grads through the freshly-updated discriminator — one dispatch per
batch, donated state.

Usage: name your discriminator modules in ``disc_keys`` and override

- ``compute_forward(batch, stage)``: generator outputs.
- ``compute_disc_loss(predictions, batch, stage)``: discriminator loss
  (apply ``jax.lax.stop_gradient`` to generator outputs — they are
  constants for this update anyway, stop_gradient just documents it).
- ``compute_gen_loss(predictions, batch, stage)``: generator loss
  (adversarial terms route through ``self.modules.<disc>``).
- ``compute_objectives``: defaults to ``compute_gen_loss`` (used for
  eval).
"""

import functools

import jax
import jax.numpy as jnp
import optax

from speechbrain_tpu.core import Brain, Stage

__all__ = ["GANBrain"]


class GANBrain(Brain):
    """Brain subclass with a fused generator/discriminator train step.

    Extra constructor arguments
    ---------------------------
    disc_keys : list[str]
        Module names belonging to the discriminator; all other modules
        are generator-side.
    opt_class_d : callable | None
        ``lr -> optax optimizer`` for the discriminator (defaults to
        ``opt_class``).
    """

    def __init__(self, *args, disc_keys=(), opt_class_d=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.disc_keys = tuple(disc_keys)
        self.opt_class_d = opt_class_d or self.opt_class
        self.lr_d = self.lr
        self.optimizer_d = None

    # -- user overrides -------------------------------------------------

    def compute_disc_loss(self, predictions, batch, stage):
        """Discriminator loss for one batch."""
        raise NotImplementedError

    def compute_gen_loss(self, predictions, batch, stage):
        """Generator loss for one batch."""
        raise NotImplementedError

    def compute_objectives(self, predictions, batch, stage):
        """Eval objective = generator loss."""
        return self.compute_gen_loss(predictions, batch, stage)

    def init_trace_extra(self, batch, predictions):
        """Trace discriminator modules so lazy init creates their
        params too."""
        self.compute_disc_loss(predictions, batch, Stage.TRAIN)
        self.compute_gen_loss(predictions, batch, Stage.TRAIN)

    # -- optimizers -----------------------------------------------------

    def init_optimizers(self):
        """Two optax chains with injectable lr (g + d)."""
        if self.opt_class is None:
            return
        clip = self.max_grad_norm

        def factory(opt_class):
            def build(learning_rate):
                parts = []
                if clip is not None and clip > 0:
                    parts.append(optax.clip_by_global_norm(clip))
                parts.append(opt_class(learning_rate))
                return optax.chain(*parts)

            return build

        self.optimizer = optax.inject_hyperparams(
            factory(self.opt_class)
        )(learning_rate=self.lr)
        self.optimizer_d = optax.inject_hyperparams(
            factory(self.opt_class_d)
        )(learning_rate=self.lr_d)

    def _split_params(self, params):
        g = {k: v for k, v in params.items() if k not in self.disc_keys}
        d = {k: v for k, v in params.items() if k in self.disc_keys}
        return g, d

    def _ensure_initialized(self, batch):
        if self.train_state is not None:
            return
        super()._ensure_initialized(batch)
        # Re-shape opt state: generator slice under the g optimizer,
        # discriminator slice under the d optimizer.
        params = jax.tree_util.tree_map(
            lambda x: x, self.train_state["params"]
        )
        g_params, d_params = self._split_params(params)
        from speechbrain_tpu.parallel.sharding import replicate_tree

        self.train_state["opt_state"] = replicate_tree(
            self.mesh,
            {
                "g": self.optimizer.init(g_params),
                "d": self.optimizer_d.init(d_params),
            },
        )

    # -- fused train step ----------------------------------------------

    def _loss_part(self, part, params, model_state, extra, batch, rngs):
        """part: 'disc' or 'gen' — bind + compute that side's loss."""
        self._bind(params, model_state, extra, rngs, train=True)
        predictions = self.compute_forward(batch, Stage.TRAIN)
        if part == "disc":
            loss = self.compute_disc_loss(
                predictions, batch, Stage.TRAIN
            )
        else:
            loss = self.compute_gen_loss(predictions, batch, Stage.TRAIN)
        new_model_state = {
            **(model_state or {}),
            **self._mutable_updates,
        }
        new_extra = getattr(self, "_new_extra", None) or extra
        self._new_extra = None
        return loss, (new_model_state, new_extra)

    def _gan_step(self, state, batch, rng, lr_g, lr_d):
        rngs = self._make_step_rngs(rng)
        params = state["params"]
        g_params, d_params = self._split_params(params)

        # ---- discriminator update (generator frozen) ----
        def d_loss_fn(dp):
            loss, aux = self._loss_part(
                "disc", {**g_params, **dp}, state["model_state"],
                state["extra"], batch, rngs,
            )
            return loss, aux

        (loss_d, _), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_params)
        opt_d = state["opt_state"]["d"]
        opt_d.hyperparams["learning_rate"] = jnp.asarray(
            lr_d, dtype=opt_d.hyperparams["learning_rate"].dtype
        )
        d_updates, new_opt_d = self.optimizer_d.update(
            d_grads, opt_d, d_params
        )
        d_params = optax.apply_updates(d_params, d_updates)

        # ---- generator update (through the updated discriminator) ----
        def g_loss_fn(gp):
            loss, aux = self._loss_part(
                "gen", {**gp, **d_params}, state["model_state"],
                state["extra"], batch, rngs,
            )
            return loss, aux

        (loss_g, (model_state, extra)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_params)
        opt_g = state["opt_state"]["g"]
        opt_g.hyperparams["learning_rate"] = jnp.asarray(
            lr_g, dtype=opt_g.hyperparams["learning_rate"].dtype
        )
        g_updates, new_opt_g = self.optimizer.update(
            g_grads, opt_g, g_params
        )
        g_params = optax.apply_updates(g_params, g_updates)

        new_state = {
            "params": {**g_params, **d_params},
            "model_state": model_state,
            "opt_state": {"g": new_opt_g, "d": new_opt_d},
            "extra": extra,
        }
        return new_state, loss_g, loss_d

    def _get_jitted(self, kind):
        if kind == "train" and "train" not in self._jit_cache:
            self._jit_cache["train"] = jax.jit(
                self._gan_step, donate_argnums=(0,)
            )
        return super()._get_jitted(kind)

    def fit_batch(self, batch):
        """One adversarial step; returns the generator loss."""
        device_batch = self.prepare_batch(batch)
        self._ensure_initialized(device_batch)
        rng = self._next_rng()
        self.train_state, loss_g, loss_d = self._get_jitted("train")(
            self.train_state, device_batch, rng, self.lr, self.lr_d
        )
        self.optimizer_step += 1
        self._pending_losses.append(loss_g)
        self.last_disc_loss = loss_d
        loss = None
        sync_every = max(1, int(self.loss_sync_interval))
        if len(self._pending_losses) >= sync_every:
            loss = self._sync_losses()
        self.on_fit_batch_end(batch, None, loss, True)
        return loss
