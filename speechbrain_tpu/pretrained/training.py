"""Saving a trained Brain in pretrained-interface format.

Parity target: reference ``pretrained/training.py:14``
(save_for_pretrained).
"""

import os

from flax import serialization

__all__ = ["save_for_pretrained"]


def save_for_pretrained(brain, savedir, module_names=None, hparams_yaml=None):
    """Write one msgpack variables file per module + hyperparams.yaml.

    Each ``<name>.ckpt`` holds the full flax variables dict
    ({"params": ..., possibly "batch_stats": ...}) so the inference
    interfaces can ``module.apply`` it directly.
    """
    os.makedirs(savedir, exist_ok=True)
    import jax

    state = jax.device_get(brain.train_state)
    names = module_names or list(brain._module_defs.keys())
    for name in names:
        variables = {"params": state["params"][name]}
        variables.update(state["model_state"].get(name, {}))
        with open(os.path.join(savedir, f"{name}.ckpt"), "wb") as f:
            f.write(serialization.to_bytes(variables))
    if hparams_yaml is not None:
        import shutil

        shutil.copy(
            hparams_yaml, os.path.join(savedir, "hyperparams.yaml")
        )
