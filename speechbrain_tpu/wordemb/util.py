"""Word-embedding utilities.

Parity target: reference ``wordemb/util.py:10`` (expand_to_chars).
"""

import jax.numpy as jnp

__all__ = ["expand_to_chars"]


def expand_to_chars(emb, seq, seq_len, word_separator):
    """Broadcast word embeddings onto their characters.

    Arguments
    ---------
    emb : (B, W, D) word embeddings
    seq : (B, T) char token ids (with word_separator tokens)
    seq_len : (B,) absolute char lengths
    word_separator : int

    Returns (B, T, D): each char carries its word's embedding; separator
    positions get zeros.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> emb = jnp.array([[[1.0, 1.0], [2.0, 2.0]]])
    >>> seq = jnp.array([[5, 5, 0, 6, 6]])
    >>> out = expand_to_chars(emb, seq, jnp.array([5]), word_separator=0)
    >>> out[0, 0, 0], out[0, 3, 0]
    (Array(1., dtype=float32), Array(2., dtype=float32))
    """
    emb = jnp.asarray(emb)
    seq = jnp.asarray(seq)
    B, T = seq.shape
    is_sep = seq == word_separator
    word_idx = jnp.cumsum(is_sep.astype(jnp.int32), axis=1)
    word_idx = jnp.clip(word_idx, 0, emb.shape[1] - 1)
    char_emb = jnp.take_along_axis(
        emb, word_idx[..., None], axis=1
    )
    valid = (
        jnp.arange(T)[None, :] < jnp.asarray(seq_len)[:, None]
    ) & ~is_sep
    return jnp.where(valid[..., None], char_emb, 0.0)
