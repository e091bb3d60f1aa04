"""Pallas TPU depthwise 1-d convolution (conformer conv module).

XLA lowers grouped convolutions with ``feature_group_count == C`` badly
on TPU (each group is padded toward MXU tiles); at conformer shapes the
12-layer stack's depthwise convs cost ~10 ms of a 60 ms train step
(measured, B=32 T=251 C=144 K=31, fwd+bwd).  Depthwise conv is pure
VPU work: this kernel holds one batch row in VMEM and accumulates the
K taps as shifted multiply-adds, reading x once instead of per-tap —
bandwidth-bound at speed-of-light instead of MXU-padding-bound.

Forward:   out[b,t,c] = sum_k w[k,c] * x[b, t+k-pad_left, c]
Backward:  dx = depthwise correlation of dy with the flipped kernel
           (the same kernel, flipped taps, complementary padding);
           dw[k,c] = sum_{b,t} dy[b,t,c] * x[b, t+k-pad_left, c].

Replaces the role of cuDNN's depthwise conv in the reference stack
(reference ``lobes/models/transformer/Conformer.py:24`` ConvolutionModule).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["depthwise_conv1d"]

# Full-row blocks: one (T + K - 1, C) slab per batch element in VMEM.
# Guard against configs that would overflow VMEM (fallback to XLA).
_VMEM_LIMIT_BYTES = 8 * 1024 * 1024


def _fwd_kernel(x_ref, w_ref, o_ref, *, K, T):
    x = x_ref[0].astype(jnp.float32)  # (T + K - 1, C)
    acc = jnp.zeros((T, x.shape[-1]), jnp.float32)
    for k in range(K):
        acc = acc + x[k : k + T, :] * w_ref[k, :].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _dw_kernel(x_ref, dy_ref, dw_ref, *, K, T):
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)  # (T + K - 1, C)
    dy = dy_ref[0].astype(jnp.float32)  # (T, C)

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    taps = [jnp.sum(x[k : k + T, :] * dy, axis=0) for k in range(K)]
    dw_ref[...] += jnp.stack(taps, axis=0).astype(dw_ref.dtype)


def _pallas_forward(x_pad, w, T, interpret):
    B, TP, C = x_pad.shape
    K = w.shape[0]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, T=T),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, TP, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((K, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x_pad.dtype),
        interpret=interpret,
    )(x_pad, w)


def _pallas_dw(x_pad, dy, K, interpret):
    B, TP, C = x_pad.shape
    T = dy.shape[1]
    return pl.pallas_call(
        functools.partial(_dw_kernel, K=K, T=T),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, TP, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K, C), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
        interpret=interpret,
    )(x_pad, dy)


def _use_pallas(T, C, K, interpret):
    if interpret:
        return True
    if jax.default_backend() != "tpu":
        return False
    return 4 * (T + K - 1) * C <= _VMEM_LIMIT_BYTES


def _xla_depthwise(x_pad, w):
    # (B, TP, C) x (K, C) grouped conv, one group per channel.
    C = x_pad.shape[-1]
    return jax.lax.conv_general_dilated(
        x_pad,
        w[:, None, :].astype(x_pad.dtype),  # (K, 1, C) HIO
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=C,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _depthwise(x_pad, w, T, interpret):
    if _use_pallas(T, x_pad.shape[-1], w.shape[0], interpret):
        return _pallas_forward(x_pad, w, T, interpret)
    return _xla_depthwise(x_pad, w).astype(x_pad.dtype)


def _depthwise_fwd(x_pad, w, T, interpret):
    return _depthwise(x_pad, w, T, interpret), (x_pad, w)


def _depthwise_bwd(T, interpret, res, dy):
    x_pad, w = res
    K, C = w.shape
    # dx over the PADDED input: full correlation with the flipped taps.
    dy_pad = jnp.pad(dy, ((0, 0), (K - 1, K - 1), (0, 0)))
    w_flip = w[::-1]
    TP = x_pad.shape[1]
    if _use_pallas(TP, C, K, interpret):
        dx_pad = _pallas_forward(dy_pad, w_flip, TP, interpret)
        dw = _pallas_dw(x_pad, dy, K, interpret)
    else:
        dx_pad = _xla_depthwise(dy_pad, w_flip).astype(dy.dtype)
        frames = jnp.stack(
            [x_pad[:, k : k + T, :] for k in range(K)], axis=0
        )
        dw = jnp.einsum(
            "kbtc,btc->kc",
            frames.astype(jnp.float32),
            dy.astype(jnp.float32),
        )
    return dx_pad.astype(x_pad.dtype), dw.astype(w.dtype)


_depthwise.defvjp(_depthwise_fwd, _depthwise_bwd)


def depthwise_conv1d(x, w, bias=None, causal=False, interpret=False):
    """Depthwise 1-d convolution, same-length output.

    Arguments
    ---------
    x : (B, T, C) input
    w : (K, C) per-channel taps
    bias : (C,) optional
    causal : bool
        Left-pad only (streaming) instead of centered padding.
    interpret : bool
        Run the Pallas kernel in interpret mode (CPU tests).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> x = jnp.ones((2, 8, 4))
    >>> w = jnp.ones((3, 4))
    >>> depthwise_conv1d(x, w).shape
    (2, 8, 4)
    """
    K = w.shape[0]
    B, T, C = x.shape
    # Lane-tile packing: a (T, C) row occupies ceil(C/128) lane tiles,
    # so C=144 pays for 256 lanes — 78% more VPU FMA issue than the
    # math needs.  When the 128-remainder divides 128, the remainder
    # channels of g = 128//rem batch rows pack into ONE full tile:
    # measured fwd+bwd 6.32 -> 2.22 ms (+0.23 ms pack/unpack) at the
    # conformer SoL config (B=512, T=251, C=144, K=31) — 2.5x net
    # (round 5; the round-4 "not worth the complexity" judgment was a
    # guess, and wrong).  Per-channel taps make batch-packing exact:
    # the packed lanes convolve independently with tiled taps.
    C0 = (C // 128) * 128
    rem = C - C0
    if (
        0 < rem <= 64
        and 128 % rem == 0
        and B % (128 // rem) == 0
        and C >= 128
    ):
        g = 128 // rem
        main = (
            depthwise_conv1d(
                x[:, :, :C0], w[:, :C0], None, causal, interpret
            )
            if C0
            else None
        )
        xr = (
            x[:, :, C0:]
            .reshape(B // g, g, T, rem)
            .transpose(0, 2, 1, 3)
            .reshape(B // g, T, g * rem)
        )
        wr = jnp.tile(w[:, C0:], (1, g))
        outr = depthwise_conv1d(xr, wr, None, causal, interpret)
        outr = (
            outr.reshape(B // g, T, g, rem)
            .transpose(0, 2, 1, 3)
            .reshape(B, T, rem)
        )
        out = (
            jnp.concatenate([main, outr], axis=-1) if C0 else outr
        )
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out
    if causal:
        pad = (K - 1, 0)
    else:
        pad = ((K - 1) // 2, K - 1 - (K - 1) // 2)
    x_pad = jnp.pad(x, ((0, 0), pad, (0, 0)))
    out = _depthwise(x_pad, w, x.shape[1], interpret)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
