"""Token embedding, with one-hot blank mode for transducer prediction nets.

Parity target: reference ``nnet/embedding.py:14``.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["Embedding"]


class Embedding(nn.Module):
    """Lookup embedding for int token ids.

    Arguments
    ---------
    num_embeddings : int
        Vocab size.
    embedding_dim : int
        Ignored when consider_as_one_hot (dim = num_embeddings - 1).
    consider_as_one_hot : bool
        Produce fixed one-hot encodings with blank_id as all-zeros (used
        by transducer prediction networks).
    blank_id : int

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> emb = Embedding(num_embeddings=5, embedding_dim=3)
    >>> p = emb.init(jax.random.PRNGKey(0), jnp.array([[0, 1]]))
    >>> emb.apply(p, jnp.array([[0, 1]])).shape
    (1, 2, 3)
    """

    num_embeddings: int
    embedding_dim: int = 128
    consider_as_one_hot: bool = False
    blank_id: int = 0

    @nn.compact
    def __call__(self, x):
        x = jnp.asarray(x, jnp.int32)
        if self.consider_as_one_hot:
            dim = self.num_embeddings - 1
            one_hot = jax.nn.one_hot(x, self.num_embeddings)
            # Remove the blank column; blank becomes the zero vector.
            cols = [i for i in range(self.num_embeddings) if i != self.blank_id]
            return one_hot[..., jnp.asarray(cols)]
        return nn.Embed(
            num_embeddings=self.num_embeddings,
            features=self.embedding_dim,
        )(x)
