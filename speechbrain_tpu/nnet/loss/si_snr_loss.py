"""SI-SNR loss (reference ``nnet/loss/si_snr_loss.py``)."""

from speechbrain_tpu.nnet.losses import cal_si_snr

__all__ = ["si_snr_loss"]


def si_snr_loss(y_pred_batch, y_true_batch, lens=None, reduction="mean"):
    """Negative scale-invariant SNR between (B, T) signals.

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> x = jnp.asarray(np.random.default_rng(0)
    ...                 .normal(size=(2, 100)).astype(np.float32))
    >>> bool(si_snr_loss(x, x) < -50)
    True
    """
    import jax.numpy as jnp

    y_pred = jnp.asarray(y_pred_batch)[..., None]
    y_true = jnp.asarray(y_true_batch)[..., None]
    snr = cal_si_snr(y_true, y_pred)[..., 0]
    loss = -snr
    if reduction == "mean":
        return loss.mean()
    return loss
