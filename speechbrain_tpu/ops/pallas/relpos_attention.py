"""Pallas TPU blocked attention with IN-KERNEL Transformer-XL
relative-position bias.

The conformer's RelPosMHAXL scores are

    s[q, k] = ((x_q + u) . k_k  +  (x_q + v) . p_{T-1-q+k}) * scale

(reference ``nnet/attention.py:362-641``; ``p`` are the projected
relative-position encodings indexed l = T-1-(q-k), scale =
1/sqrt(d_model)).  The XLA formulation materializes a (B, H, T, 2T-1)
position-score tensor plus its rel-shifted (B, H, T, T) form in HBM —
measured 36% of the d512 train step (VPU contractions 15% + rel-shift
reshapes 11% + layout copies 10%, PERFORMANCE.md round 4) against 19%
for ALL MXU GEMMs.

This kernel computes the bias INSIDE the attention block and never
materializes any (T, T) or (T, 2T-1) tensor:

- per q-block, the needed ``p`` rows form one contiguous BAND of
  width BQ + T - 1; the band product PB = (Q + v) @ P_band^T is one
  MXU matmul;
- the rel-shift becomes a SHEAR: M[i, j] = PB[i, C - i + j], i.e.
  row i right-rotated by i — applied in log2(BQ) static lane-rolls
  gated by 0/1 row-bit masks (no gathers, no relayouts; i1
  broadcast masks are avoided per the Mosaic lessons);
- scores, softmax and the context matmul stay VMEM-resident.

Sequence lengths up to MAX_T are handled single-pass per q-block (no
online softmax needed: a (BQ, T) f32 score tile fits VMEM); longer
sequences fall back to the XLA path at the call site.

The backward pass is the standard flash identity ds = p*(dp - D) with
the bias REGENERATED in-kernel and its gradient pushed back through
the inverse shear (a per-row LEFT rotation) onto dP, du, dv —
accumulated into VMEM-resident blocks across the sequential TPU grid.

Post-softmax attention dropout (the reference applies dropout to the
normalized weights) is supported with in-kernel counter-based PRNG:
``ctx = ((e * keep) @ v) / ((1-rate) * l)`` which equals
``dropout(softmax(s)) @ v``; the backward regenerates the same mask
from the same per-block seed.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["relpos_attention", "relpos_attention_reference"]

NEG = -1e9
MAX_T = 512  # single-pass (BQ, T) score tile bound
BQ = 128
OFF = 128  # front padding of the P table (keeps band starts >= 0)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _shear(x, left):
    """Row-index shear: out[i, c] = x[i, c -/+ i] via log2 static rolls.

    ``left=False``: out[i, c] = x[i, c - i]  (right-rotate row i by i)
    ``left=True``:  out[i, c] = x[i, c + i]  (left-rotate row i by i)
    """
    n = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    b = 1
    while b < n:
        amount = -b if left else b
        rolled = jnp.roll(x, amount, axis=1)
        bit = ((rows // b) % 2).astype(x.dtype)
        x = rolled * bit + x * (1.0 - bit)
        b *= 2
    return x


def _dropout_keep(shape, rate, seed):
    """0/1 keep mask from the in-kernel PRNG (counter-based, so the
    backward regenerates it exactly from the same seed)."""
    pltpu.prng_seed(seed)
    bits = pltpu.prng_random_bits(shape)
    # uint32 threshold comparison; bits are uniform
    thresh = np.uint32(min(2 ** 32 - 1, int(rate * (2 ** 32))))
    return (bits.astype(jnp.uint32) >= thresh).astype(jnp.float32)


def _scores(q_ref, k_ref, p_ref, u_ref, vb_ref, madd_ref, h, qi,
            T, Tp, scale, causal):
    """(BQ, Tp) masked scaled scores for q-block qi — shared fwd/bwd."""
    # bf16 multiplicands, exact f32 accumulation: 4x the MXU rate of
    # f32 dots; the d512 production path runs bf16 activations anyway.
    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, dh)
    k = k_ref[0, 0].astype(jnp.bfloat16)  # (Tp, dh)
    u = u_ref[h].astype(jnp.float32)  # (dh,) dynamic head row
    vb = vb_ref[h].astype(jnp.float32)
    content = jax.lax.dot_general(
        (q + u[None]).astype(jnp.bfloat16), k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Tp)
    # position band: rows l' = OFF + T-1 - (q0+i) + j for this block
    q0 = qi * BQ
    Wp = BQ + Tp
    band0 = OFF + T - 1 - q0 - (BQ - 1)
    band = p_ref[0, pl.ds(band0, Wp), :].astype(jnp.bfloat16)  # (Wp, dh)
    pb = jax.lax.dot_general(
        (q + vb[None]).astype(jnp.bfloat16), band,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Wp)
    # M[i, j] = pb[i, (BQ-1) - i + j]: right-shear then uniform shift
    m = _shear(pb, left=False)  # m[i, c] = pb[i, c - i]
    m = jnp.roll(m, -(BQ - 1), axis=1)[:, :Tp]
    s = (content + m) * scale
    s = s + madd_ref[0, 0][None, :]  # key padding (+ T-pad) mask
    if causal:
        rows = q0 + jax.lax.broadcasted_iota(jnp.int32, (BQ, Tp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, Tp), 1)
        s = jnp.where(cols > rows, NEG, s)
    return s


def _fwd_kernel(q_ref, k_ref, v_ref, p_ref, u_ref, vb_ref, madd_ref,
                o_ref, lse_ref, *, T, Tp, scale, causal, rate, seed, H):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    s = _scores(q_ref, k_ref, p_ref, u_ref, vb_ref, madd_ref, h, qi,
                T, Tp, scale, causal)
    mx = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - mx)
    l = jnp.sum(e, axis=1, keepdims=True)
    if rate > 0.0:
        nq = pl.num_programs(2)
        keep = _dropout_keep(
            (BQ, Tp), rate, seed + ((b * H + h) * nq + qi)
        )
        e_ctx = e * keep * (1.0 / (1.0 - rate))
    else:
        e_ctx = e
    v = v_ref[0, 0].astype(jnp.bfloat16)
    ctx = jax.lax.dot_general(
        e_ctx.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l
    o_ref[0, 0] = ctx.astype(o_ref.dtype)
    lse_ref[0, 0] = (mx + jnp.log(l)).astype(lse_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, p_ref, u_ref, vb_ref, madd_ref,
                do_ref, lse_ref, dsum_ref,
                dq_ref, dk_ref, dv_ref, dp_ref, du_ref, dvb_ref,
                *, T, Tp, scale, causal, rate, seed, H):
    b = pl.program_id(1)
    h = pl.program_id(0)  # h OUTERMOST: dp/du/dvb blocks stay resident
    qi = pl.program_id(2)
    nb = pl.num_programs(1)
    nq = pl.num_programs(2)

    @pl.when((b == 0) & (qi == 0))
    def _init_head_accs():
        dp_ref[0] = jnp.zeros_like(dp_ref[0])

    @pl.when((h == 0) & (b == 0) & (qi == 0))
    def _init_bias_accs():
        du_ref[...] = jnp.zeros_like(du_ref[...])
        dvb_ref[...] = jnp.zeros_like(dvb_ref[...])

    @pl.when(qi == 0)
    def _init_kv_accs():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    s = _scores(q_ref, k_ref, p_ref, u_ref, vb_ref, madd_ref, h, qi,
                T, Tp, scale, causal)
    p = jnp.exp(s - lse_ref[0, 0])  # (BQ, Tp) softmax weights
    do = do_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.bfloat16)
    dpw = jax.lax.dot_general(  # dO @ V^T
        do.astype(jnp.bfloat16), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        keep = _dropout_keep(
            (BQ, Tp), rate, seed + ((b * H + h) * nq + qi)
        )
        inv = 1.0 / (1.0 - rate)
        dv_term = (p * keep * inv).astype(jnp.float32)
        dpw = dpw * keep * inv
    else:
        dv_term = p
    ds = p * (dpw - dsum_ref[0, 0]) * scale  # (BQ, Tp)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.bfloat16)
    u = u_ref[h].astype(jnp.float32)
    vb = vb_ref[h].astype(jnp.float32)

    # content term (bf16 multiplicands, f32 accumulation)
    dsb = ds.astype(jnp.bfloat16)
    dq = jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0, 0] += jax.lax.dot_general(
        dsb, (q + u[None]).astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        dv_term.astype(jnp.bfloat16), do.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    du_ref[h] += jnp.sum(dq, axis=0).astype(du_ref.dtype)

    # position term through the inverse shear
    Wp = BQ + Tp
    dmp = jnp.pad(ds, ((0, 0), (BQ - 1, Wp - Tp - (BQ - 1))))
    dpb = _shear(dmp, left=True)  # dpb[i, c] = ds[i, c + i - (BQ-1)]
    q0 = qi * BQ
    band0 = OFF + T - 1 - q0 - (BQ - 1)
    band = p_ref[0, pl.ds(band0, Wp), :].astype(jnp.bfloat16)
    dpbb = dpb.astype(jnp.bfloat16)
    dqv = jax.lax.dot_general(
        dpbb, band, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq = dq + dqv
    dvb_ref[h] += jnp.sum(dqv, axis=0).astype(dvb_ref.dtype)
    dband = jax.lax.dot_general(
        dpbb, (q + vb[None]).astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Wp, dh)
    cur = dp_ref[0, pl.ds(band0, Wp), :]
    dp_ref[0, pl.ds(band0, Wp), :] = cur + dband.astype(dp_ref.dtype)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _pad_p(p, T, dh):
    """(2T-1, dh) -> front/back zero-padded P table for band slicing."""
    Tp = _round_up(T, BQ)
    P2 = _round_up(OFF + T + Tp + BQ, 128)
    out = jnp.zeros((p.shape[0], P2, dh), p.dtype)
    return jax.lax.dynamic_update_slice(out, p, (0, OFF, 0)), P2


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10)
)
def relpos_attention(q, k, v, p, u, vb, madd,
                     scale, causal=False, rate=0.0, seed=0):
    """Blocked rel-pos attention, (B, H, T, dh) layout.

    Arguments
    ---------
    q, k, v : (B, H, Tp, dh) projected heads, Tp a multiple of 128
        (pad rows masked via ``madd``).
    p : (H, 2T-1, dh) projected relative-position encodings
        (l = T-1-(q-k) indexing, RelPosEncXL order).
    u, vb : (H, dh) positional bias vectors (pos_bias_u / pos_bias_v).
    madd : (B, Tp) additive key mask (0 = attend, NEG = masked;
        must cover both key padding and the T..Tp pad region).
    scale : float score scale (reference: 1/sqrt(d_model)).
    causal : bool static.
    rate : attention dropout rate (post-softmax, reference semantics).
    seed : int PRNG seed for the dropout mask.

    Returns (B, H, Tp, dh) context (f32).
    """
    out, _ = _fwd(q, k, v, p, u, vb, madd, scale, causal, rate, seed)
    return out


def _fwd(q, k, v, p, u, vb, madd, scale, causal, rate, seed):
    B, H, Tp, dh = q.shape
    T = (p.shape[1] + 1) // 2
    # f32 at the kernel boundary: Mosaic's dynamic sublane reads
    # (u_ref[h], the p band slice) only support 32-bit element types;
    # these operands are tiny, and the kernel casts multiplicands to
    # bf16 itself.
    pp, P2 = _pad_p(p.astype(jnp.float32), T, dh)
    u = u.astype(jnp.float32)
    vb = vb.astype(jnp.float32)
    nq = Tp // BQ
    grid = (B, H, nq)
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, T=T, Tp=Tp, scale=scale, causal=causal,
            rate=rate, seed=seed, H=H,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BQ, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Tp, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, P2, dh), lambda b, h, i: (h, 0, 0)),
            pl.BlockSpec((H, dh), lambda b, h, i: (0, 0)),
            pl.BlockSpec((H, dh), lambda b, h, i: (0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda b, h, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BQ, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tp, dh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Tp, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, pp, u, vb, madd[:, None, :])
    return o, (q, k, v, p, u, vb, madd, o, lse)


def _bwd(scale, causal, rate, seed, res, do):
    q, k, v, p, u, vb, madd, o, lse = res
    B, H, Tp, dh = q.shape
    T = (p.shape[1] + 1) // 2
    pp, P2 = _pad_p(p.astype(jnp.float32), T, dh)
    u32 = u.astype(jnp.float32)
    vb32 = vb.astype(jnp.float32)
    nq = Tp // BQ
    do = do.astype(jnp.float32)
    dsum = jnp.sum(do * o, axis=-1, keepdims=True)  # (B, H, Tp, 1)
    grid = (H, B, nq)  # h outermost: per-head accumulators resident
    dq, dk, dv, dpp, du, dvb = pl.pallas_call(
        functools.partial(
            _bwd_kernel, T=T, Tp=Tp, scale=scale, causal=causal,
            rate=rate, seed=seed, H=H,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BQ, dh), lambda h, b, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Tp, dh), lambda h, b, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, dh), lambda h, b, i: (b, h, 0, 0)),
            pl.BlockSpec((1, P2, dh), lambda h, b, i: (h, 0, 0)),
            pl.BlockSpec((H, dh), lambda h, b, i: (0, 0)),
            pl.BlockSpec((H, dh), lambda h, b, i: (0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda h, b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, BQ, dh), lambda h, b, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda h, b, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda h, b, i: (b, h, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BQ, dh), lambda h, b, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Tp, dh), lambda h, b, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tp, dh), lambda h, b, i: (b, h, 0, 0)),
            pl.BlockSpec((1, P2, dh), lambda h, b, i: (h, 0, 0)),
            pl.BlockSpec((H, dh), lambda h, b, i: (0, 0)),
            pl.BlockSpec((H, dh), lambda h, b, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tp, dh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Tp, dh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Tp, dh), jnp.float32),
            jax.ShapeDtypeStruct((H, P2, dh), jnp.float32),
            jax.ShapeDtypeStruct((H, dh), jnp.float32),
            jax.ShapeDtypeStruct((H, dh), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, pp, u32, vb32, madd[:, None, :], do, lse, dsum)
    dp = dpp[:, OFF : OFF + 2 * T - 1]
    dq = dq.astype(q.dtype)
    dk = dk.astype(k.dtype)
    dv = dv.astype(v.dtype)
    return (dq, dk, dv, dp.astype(p.dtype), du.astype(u.dtype),
            dvb.astype(vb.dtype), jnp.zeros_like(madd))


relpos_attention.defvjp(_fwd, _bwd)


def _interpret():
    return jax.default_backend() != "tpu"


def relpos_attention_reference(q, k, v, p, u, vb, madd,
                               scale, causal=False):
    """Plain-XLA oracle with identical semantics (no dropout)."""
    B, H, Tp, dh = q.shape
    T = (p.shape[1] + 1) // 2
    content = jnp.einsum("bhqd,bhkd->bhqk", q + u[None, :, None], k)
    ps = jnp.einsum("bhqd,hld->bhql", q + vb[None, :, None], p)
    # rel shift: out[q, j] = ps[q, T-1-q+j]
    idx = (
        jnp.arange(Tp)[:, None] * 0
        + (T - 1)
        - jnp.arange(Tp)[:, None]
        + jnp.arange(Tp)[None, :]
    )
    idx = jnp.clip(idx, 0, 2 * T - 2)
    pos = jnp.take_along_axis(
        ps, jnp.broadcast_to(idx, (B, H, Tp, Tp)), axis=-1
    )
    s = (content + pos) * scale + madd[:, None, None, :]
    if causal:
        qi = jnp.arange(Tp)[:, None]
        ki = jnp.arange(Tp)[None, :]
        s = jnp.where(ki > qi, NEG, s)
    attn = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)
