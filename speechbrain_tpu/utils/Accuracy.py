"""Accuracy computation (reference ``utils/Accuracy.py:49``)."""

from speechbrain_tpu.utils.metric_stats import AccuracyStats  # noqa: F401

__all__ = ["AccuracyStats"]


def Accuracy(log_probabilities, targets, length=None):
    """Number of correct predictions and total (reference
    ``utils/Accuracy.py:6``): argmax over the vocab axis, masked by
    relative ``length``.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> probs = jnp.log(jnp.array([[[0.9, 0.1], [0.2, 0.8]]]))
    >>> Accuracy(probs, jnp.array([[0, 1]]))
    (2.0, 2.0)
    """
    import numpy as np

    lp = np.asarray(log_probabilities)
    tg = np.asarray(targets)
    if length is not None:
        lens = np.round(np.asarray(length) * tg.shape[1]).astype(int)
        mask = np.arange(tg.shape[1])[None, :] < lens[:, None]
    else:
        mask = np.ones_like(tg, dtype=bool)
    pred = lp.argmax(-1)
    numerator = float(((pred == tg) & mask).sum())
    denominator = float(mask.sum())
    return numerator, denominator
