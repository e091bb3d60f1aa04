"""Guided attention loss (TTS alignment regularizer).

Parity target: reference ``nnet/loss/guidedattn_loss.py:17``.
Penalizes attention mass far from the diagonal:
w[n, t] = 1 - exp(-((n/N - t/T)^2) / (2 sigma^2)).
"""

import jax.numpy as jnp

__all__ = ["GuidedAttentionLoss"]


class GuidedAttentionLoss:
    """Soft diagonal attention guide.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> loss_fn = GuidedAttentionLoss(sigma=0.2)
    >>> diag = jnp.eye(4)[None]  # perfectly diagonal attention
    >>> off = jnp.roll(jnp.eye(4), 2, axis=1)[None]
    >>> bool(loss_fn(diag, jnp.array([4]), jnp.array([4]))
    ...      < loss_fn(off, jnp.array([4]), jnp.array([4])))
    True
    """

    def __init__(self, sigma=0.2):
        self.sigma = sigma

    def __call__(self, attention, input_lengths, target_lengths, max_input_len=None, max_target_len=None):
        """attention: (B, T_dec, T_enc); lengths absolute."""
        attention = jnp.asarray(attention)
        B, T_dec, T_enc = attention.shape
        in_len = jnp.asarray(input_lengths).reshape(B, 1, 1)
        tg_len = jnp.asarray(target_lengths).reshape(B, 1, 1)
        n = jnp.arange(T_dec)[None, :, None]
        t = jnp.arange(T_enc)[None, None, :]
        w = 1.0 - jnp.exp(
            -((n / jnp.maximum(tg_len, 1) - t / jnp.maximum(in_len, 1)) ** 2)
            / (2 * self.sigma ** 2)
        )
        mask = (n < tg_len) & (t < in_len)
        losses = attention * jnp.where(mask, w, 0.0)
        # reference reduces with a PLAIN mean over all (B, T_dec, T_enc)
        # entries, padding included (guidedattn_loss.py:114)
        return losses.mean()
