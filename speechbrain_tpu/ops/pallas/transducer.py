"""Pallas TPU kernel for the RNN-T forward-backward lattice.

Replaces the reference's Numba CUDA wavefront kernels
(``nnet/loss/transducer_loss.py:34-238``).  TPU dataflow:

- The (T, U) lattice recurrence has a sequential dependency in t and a
  first-order linear recurrence in u (log semiring).  The kernel walks t
  through the GRID (TPU grid steps run sequentially, so VMEM scratch
  carries alpha/beta rows between steps) and solves each row's
  u-recurrence with an in-register Hillis-Steele prefix scan over lanes
  (log2(U) vector ops) — the same wavefront as the CUDA kernel, mapped
  to an 8x128 vector core instead of per-thread atomics.
- 8 batch elements ride the sublanes of each program; the grid is
  (B/8, T) for the forward pass and reversed block indexing for the
  backward (beta) pass.
- The gradient uses the standard occupancy form
  d emit[t,u] = -exp(alpha[t,u] + emit[t,u] + beta[t,u+1] - logZ),
  d blank[t,u] = -exp(alpha[t,u] + blank[t,u] + beta[t+1,u] - logZ),
  computed inside the backward kernel; scatter back to the (V,) vocab
  axis happens outside in jnp (XLA scatter-add).

The public entry :func:`transducer_loss_pallas` is a ``jax.custom_vjp``
on the (B, T, U+1, V) log-probs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["transducer_loss_pallas"]

NEG_INF = -1e30
SUBLANES = 8


def _round_up(x, m):
    return (x + m - 1) // m * m


def _log_add(a, b):
    m = jnp.maximum(a, b)
    # operands are always > -inf/2 after the first combine with a real
    # value; clamp to keep exp() finite.
    m_safe = jnp.maximum(m, NEG_INF)
    return m_safe + jnp.log(
        jnp.exp(jnp.maximum(a - m_safe, -80.0))
        + jnp.exp(jnp.maximum(b - m_safe, -80.0))
    )


def _prefix_scan_row(a, b, n_lanes):
    """Solve x_u = logaddexp(x_{u-1} + a_u, b_u) for all u, per sublane.

    a, b: (8, n_lanes).  Hillis-Steele composition of affine maps in the
    log semiring: (a1,b1)∘(a2,b2) = (a1+a2, logaddexp(b1+a2, b2)).
    Identity = (0, -inf).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    d = 1
    while d < n_lanes:
        a_sh = pltpu.roll(a, d, 1)
        b_sh = pltpu.roll(b, d, 1)
        mask = lane >= d
        a_sh = jnp.where(mask, a_sh, 0.0)
        b_sh = jnp.where(mask, b_sh, NEG_INF)
        a, b = a_sh + a, _log_add(b_sh + a, b)
        d *= 2
    return b


def _suffix_scan_row(a, b, n_lanes):
    """Solve x_u = logaddexp(x_{u+1} + a_u, b_u) (reverse direction)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    d = 1
    while d < n_lanes:
        # left-roll by d == right-roll by n_lanes - d
        a_sh = pltpu.roll(a, n_lanes - d, 1)
        b_sh = pltpu.roll(b, n_lanes - d, 1)
        mask = lane < (n_lanes - d)
        a_sh = jnp.where(mask, a_sh, 0.0)
        b_sh = jnp.where(mask, b_sh, NEG_INF)
        a, b = a_sh + a, _log_add(b_sh + a, b)
        d *= 2
    return b


def _fwd_kernel(
    blank_ref, blank_prev_ref, emit_ref, ulen_ref, tlen_ref,
    alpha_out_ref, final_ref,
    alpha_scratch,
):
    """Grid (B/8, T).  Per step: advance alpha one time frame.

    alpha[t,u] = logaddexp(alpha[t-1,u] + blank[t-1,u],
                           alpha[t,u-1] + emit[t,u-1])
    """
    t = pl.program_id(1)
    n_lanes = blank_ref.shape[-1]
    blank_t = blank_ref[0]  # (8, U1p) = blank lp at frame t
    blank_prev = blank_prev_ref[0]  # blank lp at frame t-1
    emit_t = emit_ref[0]  # (8, U1p): emit lp at frame t, col u
    lane = jax.lax.broadcasted_iota(jnp.int32, blank_t.shape, 1)

    # a_u for the in-row recurrence: emission of label u-1 at frame t.
    a = pltpu.roll(emit_t, 1, 1)
    a = jnp.where(lane >= 1, a, 0.0)

    @pl.when(t == 0)
    def _init():
        b0 = jnp.where(lane == 0, 0.0, NEG_INF)
        alpha_scratch[...] = _prefix_scan_row(a, b0, n_lanes)

    @pl.when(t > 0)
    def _step():
        base = alpha_scratch[...] + blank_prev  # vertical move
        alpha_scratch[...] = _prefix_scan_row(a, base, n_lanes)

    alpha_out_ref[0] = alpha_scratch[...]

    # Harvest the final log-prob on each row's last frame.
    ulen = ulen_ref[:, 0]  # (8,)
    tlen = tlen_ref[:, 0]
    at_final = tlen - 1 == t  # (8,)
    alpha_u = jnp.sum(
        jnp.where(lane == ulen[:, None], alpha_scratch[...], 0.0), axis=1
    )
    blank_u = jnp.sum(
        jnp.where(lane == ulen[:, None], blank_t, 0.0), axis=1
    )

    @pl.when(t == 0)
    def _zero_final():
        final_ref[:, 0] = jnp.zeros_like(final_ref[:, 0])

    final_ref[:, 0] = jnp.where(
        at_final, alpha_u + blank_u, final_ref[:, 0]
    )


def _bwd_kernel(
    blank_ref, emit_ref, alpha_ref, ulen_ref, tlen_ref, logz_ref,
    dblank_ref, demit_ref,
    beta_scratch,
):
    """Grid (B/8, T) with REVERSED t block indexing.

    At step k the refs hold frame t = T-1-k.  beta_scratch carries
    beta[t+1, :]; we compute beta[t, :] and the frame-t gradients.
    """
    k = pl.program_id(1)
    n_lanes = blank_ref.shape[-1]
    blank_t = blank_ref[0]
    emit_t = emit_ref[0]
    alpha_t = alpha_ref[0]
    ulen = ulen_ref[:, 0]
    tlen = tlen_ref[:, 0]
    logz = logz_ref[:, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, blank_t.shape, 1)

    @pl.when(k == 0)
    def _init():
        # Virtual beta[T, u] = 0 at u == u_len, else -inf.  (blank_lp is
        # masked to 0 for t >= t_len, so the chain walks down to the
        # true final frame unchanged.)
        beta_scratch[...] = jnp.where(
            lane == ulen[:, None], 0.0, NEG_INF
        )

    beta_next = beta_scratch[...]  # beta[t+1, :]
    b2 = beta_next + blank_t
    # In-row (suffix) recurrence: beta[t,u] = logaddexp(
    #     beta[t,u+1] + emit[t,u], b2[u])
    beta_t = _suffix_scan_row(emit_t, b2, n_lanes)
    beta_scratch[...] = beta_t

    # Gradients for frame t.
    beta_shift = pltpu.roll(beta_t, n_lanes - 1, 1)  # beta[t, u+1]
    beta_shift = jnp.where(lane < n_lanes - 1, beta_shift, NEG_INF)
    z = logz[:, None]
    # t = T-1-k is the ACTUAL frame of this grid step; blank grads only
    # exist for real frames (blank is masked to log 1 past t_len, which
    # would otherwise produce phantom occupancy).
    T = pl.num_programs(1)
    t_here = T - 1 - k
    valid_t = (t_here < tlen)[:, None]
    demit_ref[0] = -jnp.exp(
        jnp.maximum(alpha_t + emit_t + beta_shift - z, -80.0)
    ) * (emit_t > NEG_INF / 2)
    dblank_ref[0] = (
        -jnp.exp(jnp.maximum(alpha_t + blank_t + beta_next - z, -80.0))
        * (blank_t > NEG_INF / 2)
        * valid_t
    )


def _pad_inputs(log_probs, targets, t_lens, u_lens, blank_index):
    """Build masked (B', T, U1p) blank/emit tables, B' = ceil8(B)."""
    B, T, U1, V = log_probs.shape
    U = U1 - 1
    U1p = _round_up(U1, 128)
    Bp = _round_up(B, SUBLANES)
    blank_lp = log_probs[..., blank_index]  # (B, T, U1)
    emit_lp = jnp.take_along_axis(
        log_probs[:, :, :U, :],
        jnp.asarray(targets, jnp.int32)[:, None, :, None],
        axis=-1,
    )[..., 0]  # (B, T, U)
    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U1)[None, None, :]
    t_lens_c = jnp.asarray(t_lens, jnp.int32)[:, None, None]
    u_lens_c = jnp.asarray(u_lens, jnp.int32)[:, None, None]
    # blank: log 1 = 0 beyond t_len (keeps the beta boundary chain flat)
    blank_lp = jnp.where(t_idx < t_lens_c, blank_lp, 0.0)
    # emit: -inf beyond u_len or t_len
    emit_lp = jnp.where(
        (u_idx[..., :U] < u_lens_c) & (t_idx < t_lens_c), emit_lp, NEG_INF
    )
    # Pad U axis (emit gets a dead column at U1-1 and up)
    blank_pad = jnp.full((B, T, U1p - U1), 0.0)
    emit_pad = jnp.full((B, T, U1p - U), NEG_INF)
    blank_full = jnp.concatenate([blank_lp, blank_pad], axis=-1)
    emit_full = jnp.concatenate([emit_lp, emit_pad], axis=-1)
    # Pad batch
    if Bp != B:
        blank_full = jnp.concatenate(
            [blank_full, jnp.zeros((Bp - B, T, U1p))], axis=0
        )
        emit_full = jnp.concatenate(
            [emit_full, jnp.full((Bp - B, T, U1p), NEG_INF)], axis=0
        )
        t_lens = jnp.concatenate(
            [jnp.asarray(t_lens, jnp.int32), jnp.ones(Bp - B, jnp.int32)]
        )
        u_lens = jnp.concatenate(
            [jnp.asarray(u_lens, jnp.int32), jnp.zeros(Bp - B, jnp.int32)]
        )
    else:
        t_lens = jnp.asarray(t_lens, jnp.int32)
        u_lens = jnp.asarray(u_lens, jnp.int32)
    # Time-major layout for the kernels: (T, Bp, U1p)
    blank_full = jnp.swapaxes(blank_full, 0, 1)
    emit_full = jnp.swapaxes(emit_full, 0, 1)
    return blank_full, emit_full, t_lens, u_lens, U1p, Bp


def _run_forward(blank_full, emit_full, t_lens, u_lens):
    T, Bp, U1p = blank_full.shape
    grid = (Bp // SUBLANES, T)
    alpha, final = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, SUBLANES, U1p), lambda i, t: (t, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, SUBLANES, U1p),
                lambda i, t: (jnp.maximum(t - 1, 0), i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, SUBLANES, U1p), lambda i, t: (t, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (SUBLANES, 1), lambda i, t: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (SUBLANES, 1), lambda i, t: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, SUBLANES, U1p), lambda i, t: (t, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (SUBLANES, 1), lambda i, t: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, U1p), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((SUBLANES, U1p), jnp.float32)],
    )(
        blank_full.astype(jnp.float32),
        blank_full.astype(jnp.float32),
        emit_full.astype(jnp.float32),
        u_lens[:, None].astype(jnp.int32),
        t_lens[:, None].astype(jnp.int32),
    )
    return alpha, final[:, 0]


def _run_backward(blank_full, emit_full, alpha, u_lens, t_lens, logz):
    T, Bp, U1p = blank_full.shape
    grid = (Bp // SUBLANES, T)

    def rev(i, t):
        return (T - 1 - t, i, 0)

    dblank, demit = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, SUBLANES, U1p), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, U1p), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, U1p), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (SUBLANES, 1), lambda i, t: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (SUBLANES, 1), lambda i, t: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (SUBLANES, 1), lambda i, t: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, SUBLANES, U1p), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, U1p), rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, U1p), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, U1p), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((SUBLANES, U1p), jnp.float32)],
    )(
        blank_full.astype(jnp.float32),
        emit_full.astype(jnp.float32),
        alpha,
        u_lens[:, None].astype(jnp.int32),
        t_lens[:, None].astype(jnp.int32),
        logz[:, None].astype(jnp.float32),
    )
    return dblank, demit


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def transducer_loss_pallas(
    log_probs, targets, t_lens, u_lens, blank_index, normalize_by_T=False
):
    """Per-utterance RNN-T NLL via the Pallas lattice kernels.

    Same contract as
    ``speechbrain_tpu.nnet.loss.transducer_loss.transducer_forward_loss``.
    """
    loss, _ = _tl_fwd(
        log_probs, targets, t_lens, u_lens, blank_index, normalize_by_T
    )
    return loss


def _tl_fwd(log_probs, targets, t_lens, u_lens, blank_index, normalize_by_T):
    B = log_probs.shape[0]
    blank_full, emit_full, t_pad, u_pad, U1p, Bp = _pad_inputs(
        log_probs, targets, t_lens, u_lens, blank_index
    )
    alpha, final = _run_forward(blank_full, emit_full, t_pad, u_pad)
    nll = -final[:B]
    scale = 1.0
    if normalize_by_T:
        scale = 1.0 / jnp.maximum(jnp.asarray(t_lens, jnp.float32), 1.0)
        nll = nll * scale
    residuals = (
        blank_full, emit_full, alpha, final, t_pad, u_pad,
        jnp.asarray(targets, jnp.int32), log_probs.shape, scale,
    )
    return nll, residuals


def _tl_bwd(blank_index, normalize_by_T, residuals, g):
    (
        blank_full, emit_full, alpha, final, t_pad, u_pad,
        targets, lp_shape, scale,
    ) = residuals
    B, T, U1, V = lp_shape
    U = U1 - 1
    dblank, demit = _run_backward(
        blank_full, emit_full, alpha, u_pad, t_pad, final
    )
    # Kernel outputs are time-major (T, Bp, U1p).
    dblank = jnp.swapaxes(dblank, 0, 1)[:B, :, :U1]
    demit = jnp.swapaxes(demit, 0, 1)[:B, :, :U]
    # Upstream cotangent (per-utterance) and optional 1/T scale.
    g_row = jnp.asarray(g).reshape(B, 1, 1) * (
        scale if isinstance(scale, float) else scale.reshape(B, 1, 1)
    )
    # Kernel outputs are already d(loss)/d(lp) = -occupancy.
    dblank = dblank * g_row
    demit = demit * g_row
    dlp = jnp.zeros(lp_shape, jnp.float32)
    dlp = dlp.at[..., blank_index].add(dblank)
    # scatter emit grads at target labels
    b_idx = jnp.arange(B)[:, None, None]
    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U)[None, None, :]
    dlp = dlp.at[
        b_idx, t_idx, u_idx, targets[:, None, :]
    ].add(demit)
    return dlp, None, None, None


transducer_loss_pallas.defvjp(_tl_fwd, _tl_bwd)


# ---------------------------------------------------------------------------
# Logits-native entry: avoids materializing the (B,T,U,V) log-softmax.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def transducer_loss_pallas_logits(
    logits, targets, t_lens, u_lens, blank_index, normalize_by_T=False
):
    """RNN-T loss on RAW logits with the softmax fused into the VJP.

    The (B, T, U+1, V) log-probs tensor is never materialized: the
    forward builds only the (B, T, U+1) blank/emit tables
    (logit - logsumexp), and the backward applies the occupancy
    gradients through the softmax analytically:

        dL/dlogit[v] = dlp[v] - softmax[v] * (dblank + demit)

    which is one fused elementwise pass instead of log_softmax forward
    + its VJP chain (~3x less HBM traffic on the dominant tensor).
    """
    loss, _ = _tll_fwd(
        logits, targets, t_lens, u_lens, blank_index, normalize_by_T
    )
    return loss


def _build_tables_from_logits(logits, targets, blank_index):
    denom = jax.nn.logsumexp(logits, axis=-1)  # (B, T, U1)
    blank_lp = logits[..., blank_index] - denom
    U = targets.shape[1]
    emit_logit = jnp.take_along_axis(
        logits[:, :, :U, :],
        jnp.asarray(targets, jnp.int32)[:, None, :, None],
        axis=-1,
    )[..., 0]
    emit_lp = emit_logit - denom[:, :, :U]
    return blank_lp, emit_lp, denom


def _tll_fwd(logits, targets, t_lens, u_lens, blank_index, normalize_by_T):
    B, T, U1, V = logits.shape
    U = U1 - 1
    blank_lp, emit_lp, _ = _build_tables_from_logits(
        logits, targets, blank_index
    )
    blank_full, emit_full, t_pad, u_pad, U1p, Bp = _pad_tables(
        blank_lp, emit_lp, t_lens, u_lens
    )
    alpha, final = _run_forward(blank_full, emit_full, t_pad, u_pad)
    nll = -final[:B]
    scale = 1.0
    if normalize_by_T:
        scale = 1.0 / jnp.maximum(jnp.asarray(t_lens, jnp.float32), 1.0)
        nll = nll * scale
    residuals = (
        blank_full, emit_full, alpha, final, t_pad, u_pad,
        jnp.asarray(targets, jnp.int32), logits, scale,
    )
    return nll, residuals


def _pad_tables(blank_lp, emit_lp, t_lens, u_lens):
    """Mask + pad precomputed (B, T, U1)/(B, T, U) tables for the kernels."""
    B, T, U1 = blank_lp.shape
    U = U1 - 1
    U1p = _round_up(U1, 128)
    Bp = _round_up(B, SUBLANES)
    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U)[None, None, :]
    t_lens_c = jnp.asarray(t_lens, jnp.int32)[:, None, None]
    u_lens_c = jnp.asarray(u_lens, jnp.int32)[:, None, None]
    blank_lp = jnp.where(t_idx < t_lens_c, blank_lp, 0.0)
    emit_lp = jnp.where(
        (u_idx < u_lens_c) & (t_idx < t_lens_c), emit_lp, NEG_INF
    )
    blank_full = jnp.concatenate(
        [blank_lp, jnp.full((B, T, U1p - U1), 0.0)], axis=-1
    )
    emit_full = jnp.concatenate(
        [emit_lp, jnp.full((B, T, U1p - U), NEG_INF)], axis=-1
    )
    if Bp != B:
        blank_full = jnp.concatenate(
            [blank_full, jnp.zeros((Bp - B, T, U1p))], axis=0
        )
        emit_full = jnp.concatenate(
            [emit_full, jnp.full((Bp - B, T, U1p), NEG_INF)], axis=0
        )
        t_lens = jnp.concatenate(
            [jnp.asarray(t_lens, jnp.int32), jnp.ones(Bp - B, jnp.int32)]
        )
        u_lens = jnp.concatenate(
            [jnp.asarray(u_lens, jnp.int32), jnp.zeros(Bp - B, jnp.int32)]
        )
    else:
        t_lens = jnp.asarray(t_lens, jnp.int32)
        u_lens = jnp.asarray(u_lens, jnp.int32)
    return (
        jnp.swapaxes(blank_full, 0, 1),
        jnp.swapaxes(emit_full, 0, 1),
        t_lens,
        u_lens,
        U1p,
        Bp,
    )


def _tll_bwd(blank_index, normalize_by_T, residuals, g):
    (
        blank_full, emit_full, alpha, final, t_pad, u_pad,
        targets, logits, scale,
    ) = residuals
    B, T, U1, V = logits.shape
    U = U1 - 1
    dblank, demit = _run_backward(
        blank_full, emit_full, alpha, u_pad, t_pad, final
    )
    dblank = jnp.swapaxes(dblank, 0, 1)[:B, :, :U1]
    demit = jnp.swapaxes(demit, 0, 1)[:B, :, :U]
    g_row = jnp.asarray(g).reshape(B, 1, 1) * (
        scale if isinstance(scale, float) else scale.reshape(B, 1, 1)
    )
    dblank = dblank * g_row
    demit = demit * g_row
    demit_padded = jnp.concatenate(
        [demit, jnp.zeros((B, T, 1))], axis=-1
    )  # (B, T, U1)
    row_sum = dblank + demit_padded  # Σ_v dlp[v] per lattice cell
    # One fused elementwise pass (no scatter): the emit target is the
    # same for every t, so it broadcasts as (B, 1, U1, V); the blank
    # column is a (V,) comparison.
    v_idx = jnp.arange(V)
    blank_mask = (v_idx == blank_index).astype(logits.dtype)
    targets_padded = jnp.concatenate(
        [targets, jnp.full((B, 1), -1, jnp.int32)], axis=-1
    )  # (B, U1); -1 never matches
    emit_mask = (
        v_idx[None, None, :] == targets_padded[:, :, None]
    ).astype(logits.dtype)  # (B, U1, V)
    sm = jax.nn.softmax(logits, axis=-1)
    dlogits = (
        -sm * row_sum[..., None]
        + dblank[..., None] * blank_mask[None, None, None, :]
        + demit_padded[..., None] * emit_mask[:, None, :, :]
    )
    return dlogits, None, None, None


transducer_loss_pallas_logits.defvjp(_tll_fwd, _tll_bwd)
