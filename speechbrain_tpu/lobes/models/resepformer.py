"""RE-SepFormer: resource-efficient SepFormer (memory-based recurrence
across chunks instead of full inter-chunk attention).

Parity target: reference ``lobes/models/resepformer.py:609``
(RESepFormerSeparation): intra-chunk transformer shared across chunks +
a summary-memory path carrying information between adjacent chunks.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.dual_path import (
    Decoder,
    Encoder,
    SBTransformerBlock,
)
from speechbrain_tpu.nnet.CNN import Conv1d

__all__ = ["RESepformer"]


class RESepformer(nn.Module):
    """Encoder + chunked intra transformer + chunk-summary recurrence.

    Each chunk is processed by a shared intra-chunk transformer; a mean
    "summary" token per chunk runs through a lightweight inter-chunk
    transformer ONCE (linear in the number of chunks), and is broadcast
    back — replacing the quadratic inter-chunk attention of SepFormer.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = RESepformer(encoder_out_nchannels=16,
    ...     chunk_size=10, num_blocks=1, intra_numlayers=1,
    ...     intra_nhead=4, intra_dffn=32, encoder_kernel_size=8)
    >>> x = jnp.ones((1, 400))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> model.apply(v, x, train=False).shape
    (1, 400, 2)
    """

    encoder_kernel_size: int = 16
    encoder_out_nchannels: int = 256
    chunk_size: int = 130
    num_blocks: int = 4
    num_spks: int = 2
    intra_numlayers: int = 2
    intra_nhead: int = 8
    intra_dffn: int = 1024

    @nn.compact
    def __call__(self, mix, train=True):
        T_orig = mix.shape[1]
        w = Encoder(
            kernel_size=self.encoder_kernel_size,
            out_channels=self.encoder_out_nchannels,
        )(mix)
        B, T, N = w.shape
        K = self.chunk_size
        pad = (K - T % K) % K
        x = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
        S = x.shape[1] // K
        x = x.reshape(B, S, K, N)
        for blk in range(self.num_blocks):
            # Shared intra-chunk transformer
            intra = SBTransformerBlock(
                num_layers=self.intra_numlayers,
                d_model=N,
                nhead=self.intra_nhead,
                d_ffn=self.intra_dffn,
                name=f"intra_{blk}",
            )(x.reshape(B * S, K, N), train=train).reshape(B, S, K, N)
            x = x + intra
            # Chunk summaries -> inter-chunk mixing (linear cost)
            summary = x.mean(axis=2)  # (B, S, N)
            mixed = SBTransformerBlock(
                num_layers=1,
                d_model=N,
                nhead=self.intra_nhead,
                d_ffn=self.intra_dffn,
                name=f"inter_{blk}",
            )(summary, train=train)
            x = x + mixed[:, :, None, :]
        x = jax.nn.relu(
            Conv1d(
                out_channels=N * self.num_spks, kernel_size=1,
                name="mask_out",
            )(x.reshape(B, S * K, N))
        )
        masks = x[:, :T].reshape(B, T, self.num_spks, N)
        decoder = Decoder(
            kernel_size=self.encoder_kernel_size,
            in_channels=N,
        )
        outs = []
        for s in range(self.num_spks):
            y = decoder(w * masks[:, :, s])
            if y.shape[1] >= T_orig:
                y = y[:, :T_orig]
            else:
                y = jnp.pad(y, ((0, 0), (0, T_orig - y.shape[1])))
            outs.append(y)
        return jnp.stack(outs, axis=-1)
