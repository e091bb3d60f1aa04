"""SI-SNR loss (reference ``nnet/loss/si_snr_loss.py``)."""

import numpy as np

__all__ = ["si_snr_loss"]

_SMALL = float(np.finfo("float").eps)


def si_snr_loss(y_pred_batch, y_true_batch, lens=None, reduction="mean"):
    """Negative scale-invariant SNR between (B, T[, 1]) signals.

    Reference-exact (``nnet/loss/si_snr_loss.py:16``): stats over the
    first ``int(lens * T)`` samples of each example (vectorized here as
    a mask instead of the reference's per-example Python loop), eps =
    float64 machine epsilon, NO zero-mean step (the reference applies
    the projection to the raw signals).

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> x = jnp.asarray(np.random.default_rng(0)
    ...                 .normal(size=(2, 100)).astype(np.float32))
    >>> bool(si_snr_loss(x, x, jnp.ones(2)) < -50)
    True
    """
    import jax.numpy as jnp

    y_pred = jnp.asarray(y_pred_batch)
    y_true = jnp.asarray(y_true_batch)
    if y_pred.ndim == 3:
        y_pred = y_pred[..., 0]
    if y_true.ndim == 3:
        y_true = y_true[..., 0]
    T = y_pred.shape[1]
    if lens is None:
        mask = jnp.ones_like(y_pred)
    else:
        n = jnp.floor(jnp.asarray(lens) * T)  # int() truncation
        mask = (jnp.arange(T)[None, :] < n[:, None]).astype(y_pred.dtype)
    s_target = y_true * mask
    s_estimate = y_pred * mask
    dot = (s_estimate * s_target).sum(axis=1, keepdims=True)
    s_energy = (s_target ** 2).sum(axis=1, keepdims=True) + _SMALL
    proj = dot * s_target / s_energy
    e_noise = s_estimate - proj
    before_log = ((proj ** 2) * mask).sum(axis=1) / (
        ((e_noise ** 2) * mask).sum(axis=1) + _SMALL
    )
    si_snr = 10 * jnp.log10(before_log + _SMALL)
    if reduction == "mean":
        return -si_snr.mean()
    return -si_snr
