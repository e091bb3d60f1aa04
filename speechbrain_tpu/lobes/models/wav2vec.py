"""Native wav2vec 2.0 components (no HuggingFace dependency).

Parity targets: reference ``lobes/models/wav2vec.py:28``
(W2VLatentExtractor), ``:109`` (W2VTargetQuantiser), ``:155``
(EncoderWrapper), ``:238`` (compute mask), ``:305`` (sample_negatives).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    PositionalEncoding,
    TransformerEncoder,
)
from speechbrain_tpu.nnet.quantisers import GumbelVectorQuantizer

__all__ = [
    "W2VLatentExtractor",
    "W2VTargetQuantiser",
    "EncoderWrapper",
    "compute_mask",
    "sample_negatives",
]


class W2VLatentExtractor(nn.Module):
    """Strided conv feature extractor: raw wave -> latents (~50 Hz).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> ext = W2VLatentExtractor(out_channels=(16,) * 7)
    >>> x = jnp.ones((2, 16000))
    >>> v = ext.init(jax.random.PRNGKey(0), x, train=False)
    >>> ext.apply(v, x, train=False).shape
    (2, 48, 16)
    """

    out_channels: tuple = (512,) * 7
    kernel_sizes: tuple = (11, 3, 3, 3, 3, 3, 3)
    strides: tuple = (5, 2, 2, 2, 2, 2, 2)

    @nn.compact
    def __call__(self, x, train=True):
        if x.ndim == 2:
            x = x[..., None]
        for i, (c, k, s) in enumerate(
            zip(self.out_channels, self.kernel_sizes, self.strides)
        ):
            x = nn.Conv(
                features=c, kernel_size=(k,), strides=(s,),
                padding="VALID", use_bias=False, dtype=x.dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.LayerNorm(dtype=x.dtype)(x)
            x = jax.nn.gelu(x)
        return x


class W2VTargetQuantiser(nn.Module):
    """Gumbel product quantiser + target projection."""

    in_dim: int = 512
    out_dim: int = 256
    quantiser_vars: int = 320
    quantiser_groups: int = 2

    @nn.compact
    def __call__(self, x, train=True):
        vq = GumbelVectorQuantizer(
            dim=self.in_dim,
            num_vars=self.quantiser_vars,
            groups=self.quantiser_groups,
            vq_dim=self.out_dim,
        )(x, train=train)
        targets = nn.Dense(self.out_dim, dtype=x.dtype)(vq["x"])
        meta = {
            "diversity_loss": (
                vq["num_vars"] - vq["prob_perplexity"]
            ) / vq["num_vars"],
            "num_vars": vq["num_vars"],
        }
        return targets, meta


class EncoderWrapper(nn.Module):
    """Latents -> contextual representations with learned mask token.

    Call with a boolean mask (B, T) of positions to replace by the
    learned mask embedding before the transformer.
    """

    in_dim: int = 512
    embedding_dim: int = 768
    num_layers: int = 12
    nhead: int = 8
    d_ffn: int = 3072
    dropout: float = 0.1

    @nn.compact
    def __call__(self, latents, wav_lens=None, padding_mask=None, mask=None, train=True):
        x = nn.Dense(self.embedding_dim, dtype=latents.dtype)(latents)
        if mask is not None:
            mask_emb = self.param(
                "mask_emb",
                nn.initializers.uniform(scale=0.1),
                (self.embedding_dim,),
            ).astype(x.dtype)
            x = jnp.where(mask[..., None], mask_emb, x)
        x = x + PositionalEncoding(input_size=self.embedding_dim)(x)
        key_padding = None
        if wav_lens is not None:
            T = x.shape[1]
            key_padding = (
                jnp.arange(T)[None, :] >= (jnp.asarray(wav_lens) * T)[:, None]
            )
        out, _ = TransformerEncoder(
            num_layers=self.num_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.embedding_dim,
            dropout=self.dropout,
            normalize_before=True,
        )(x, src_key_padding_mask=key_padding, train=train)
        return {"embeddings": out}


def compute_mask(shape, sample_lens, mask_prob=0.65, mask_length=10, seed=0):
    """Boolean span mask (B, T) with ~mask_prob coverage (host-side numpy,
    mirroring the reference's per-batch mask computation)."""
    B, T = shape
    rng = np.random.default_rng(seed)
    mask = np.zeros((B, T), dtype=bool)
    num_spans = int(mask_prob * T / mask_length + rng.random())
    for b in range(B):
        limit = min(sample_lens[b] if sample_lens is not None else T, T)
        if limit <= mask_length:
            continue
        starts = rng.integers(0, limit - mask_length, size=num_spans)
        for s in starts:
            mask[b, s : s + mask_length] = True
    return mask


def sample_negatives(y, num_neg, key):
    """Sample distractors from other timesteps of the SAME utterance.

    y: (B, T, C) targets.  Returns (num_neg, B, T, C).
    """
    B, T, C = y.shape
    # random offsets 1..T-1 ensure a different timestep
    offsets = jax.random.randint(key, (num_neg, B, T), 1, max(T, 2))
    base = jnp.arange(T)[None, None, :]
    idx = (base + offsets) % T
    batch_idx = jnp.arange(B)[None, :, None]
    return y[batch_idx, idx]


def w2v_mask_collate_fn(
    samples_lst, get_out_len_fn, mask_prob, mask_length, seed=0
):
    """Collate raw waveforms for wav2vec2 pretraining: right-pad,
    compute latent lengths with ``get_out_len_fn``, and sample the
    contrastive mask per batch (reference
    ``lobes/models/wav2vec.py`` w2v_mask_collate_fn).

    Returns ((wavs, wav_lens, mask), ()) matching the reference's
    (inputs, dummy-targets) convention.

    Example
    -------
    >>> import numpy as np
    >>> out = w2v_mask_collate_fn(
    ...     [{"sig": np.ones(320)}, {"sig": np.ones(480)}],
    ...     get_out_len_fn=lambda n: n // 320,
    ...     mask_prob=0.5, mask_length=1)
    >>> (wavs, wav_lens, mask), _ = out
    >>> wavs.shape
    (2, 480)
    """
    wav_lens = [len(s["sig"]) for s in samples_lst]
    max_len = max(wav_lens)
    wavs = np.zeros((len(samples_lst), max_len), dtype=np.float32)
    for i, s in enumerate(samples_lst):
        wavs[i, : wav_lens[i]] = np.asarray(s["sig"], dtype=np.float32)
    out_lens = np.asarray([int(get_out_len_fn(n)) for n in wav_lens])
    T_out = int(out_lens.max())
    mask = compute_mask(
        (len(samples_lst), T_out), out_lens,
        mask_prob=mask_prob, mask_length=mask_length, seed=seed,
    )
    rel_lens = np.asarray(wav_lens, dtype=np.float32) / max_len
    return (wavs, rel_lens, np.asarray(mask)), ()
