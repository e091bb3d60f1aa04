"""Vector quantisers (wav2vec 2.0 targets).

Parity target: reference ``nnet/quantisers.py:13`` (GumbelVectorQuantizer).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["GumbelVectorQuantizer"]


class GumbelVectorQuantizer(nn.Module):
    """Gumbel-softmax product quantiser.

    input dim -> num_vars^groups codebook entries; straight-through
    during training.  Needs an rng stream "gumbel".

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> vq = GumbelVectorQuantizer(dim=16, num_vars=8, groups=2, vq_dim=16)
    >>> x = jnp.ones((2, 5, 16))
    >>> v = vq.init({"params": jax.random.PRNGKey(0),
    ...              "gumbel": jax.random.PRNGKey(1)}, x, train=True)
    >>> out = vq.apply(v, x, train=True,
    ...                rngs={"gumbel": jax.random.PRNGKey(2)})
    >>> out["x"].shape
    (2, 5, 16)
    """

    dim: int
    num_vars: int = 320
    temp_tuple: tuple = (2.0, 0.5, 0.999995)
    groups: int = 2
    vq_dim: int = 256

    @nn.compact
    def __call__(self, x, train=True, temp=None):
        B, T, C = x.shape
        G, V = self.groups, self.num_vars
        var_dim = self.vq_dim // G
        codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=1.0),
            (1, G * V, var_dim),
        )
        logits = nn.Dense(G * V, dtype=x.dtype)(x)  # (B, T, G*V)
        logits = logits.reshape(B * T * G, V)
        if temp is None:
            temp = self.temp_tuple[0]
        if train:
            rng = self.make_rng("gumbel")
            gumbels = -jnp.log(
                -jnp.log(jax.random.uniform(rng, logits.shape) + 1e-20)
                + 1e-20
            )
            y_soft = jax.nn.softmax((logits + gumbels) / temp, axis=-1)
            index = y_soft.argmax(-1)
            y_hard = jax.nn.one_hot(index, V, dtype=logits.dtype)
            probs = jax.lax.stop_gradient(y_hard - y_soft) + y_soft
        else:
            index = logits.argmax(-1)
            probs = jax.nn.one_hot(index, V, dtype=logits.dtype)
        # Perplexity diagnostics (codebook usage)
        avg_probs = jax.nn.softmax(
            logits.reshape(B * T, G, V), axis=-1
        ).mean(axis=0)
        prob_perplexity = jnp.exp(
            -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)
        ).sum()
        # Select codewords
        probs_flat = probs.reshape(B * T, G, V)
        codebook_g = codebook.reshape(G, V, var_dim)
        quantized = jnp.einsum("ngv,gvd->ngd", probs_flat, codebook_g)
        quantized = quantized.reshape(B, T, G * var_dim)
        return {
            "x": quantized,
            "prob_perplexity": prob_perplexity,
            "num_vars": G * V,
            "temp": temp,
        }
