"""Layer-averaged transformer word embeddings.

Parity target: reference ``wordemb/transformer.py:19``
(TransformerWordEmbeddings wraps HF BERT).  HuggingFace torch models
are out of scope for the torch-free build (SURVEY.md §7.4); this module
provides the same surface over ANY flax encoder exposing per-layer
hidden states — e.g. our TransformerLM — plus a hash-vocabulary
fallback for fully offline use.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TransformerWordEmbeddings"]


class TransformerWordEmbeddings:
    """Word embeddings from a contextual encoder with layer selection.

    Arguments
    ---------
    model : callable(tokens (1, T)) -> (L, T, D) per-layer states, or
        None for the deterministic hash-embedding fallback.
    tokenizer : callable(str) -> list[int], or None for whitespace+hash.
    layers : int | list, which trailing layers to average.
    dim : fallback embedding dim.
    """

    def __init__(self, model=None, tokenizer=None, layers=4, dim=256):
        self.model = model
        self.tokenizer = tokenizer
        self.layers = layers
        self.dim = dim

    def _fallback_vector(self, word):
        seed = abs(hash(word)) % (2 ** 31)
        rng = np.random.default_rng(seed)
        return rng.normal(size=self.dim).astype(np.float32)

    def embeddings(self, sentence):
        """(W, D) embeddings for the words of a sentence string."""
        words = sentence.split()
        if self.model is None:
            return jnp.asarray(
                np.stack([self._fallback_vector(w) for w in words])
            )
        tokens = (
            self.tokenizer(sentence)
            if self.tokenizer is not None
            else [abs(hash(w)) % 30000 for w in words]
        )
        states = self.model(jnp.asarray(tokens)[None])  # (L, T, D)
        if isinstance(self.layers, int):
            states = states[-self.layers :]
        else:
            states = states[jnp.asarray(self.layers)]
        token_emb = states.mean(axis=0)  # (T, D)
        # average tokens per word (whitespace tokenization assumption)
        per_word = max(token_emb.shape[0] // max(len(words), 1), 1)
        embs = [
            token_emb[i * per_word : (i + 1) * per_word].mean(axis=0)
            for i in range(len(words))
        ]
        return jnp.stack(embs)

    def __call__(self, sentence):
        return self.embeddings(sentence)

    def batch_embeddings(self, sentences):
        """List of sentences -> padded (B, W_max, D) + lengths."""
        embs = [np.asarray(self.embeddings(s)) for s in sentences]
        W = max(e.shape[0] for e in embs)
        out = np.zeros((len(embs), W, embs[0].shape[1]), np.float32)
        lens = np.zeros(len(embs), np.float32)
        for i, e in enumerate(embs):
            out[i, : e.shape[0]] = e
            lens[i] = e.shape[0] / W
        return jnp.asarray(out), jnp.asarray(lens)


class MissingTransformersError(Exception):
    """Raised when the optional ``transformers`` dependency is needed
    but not installed (reference ``wordemb/transformer.py``)."""

    def __init__(self):
        super().__init__("This module requires HuggingFace transformers")
