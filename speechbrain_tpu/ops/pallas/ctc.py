"""Pallas TPU CTC loss (log-semiring lattice, fwd + analytic VJP).

STATUS (measured, dev v5e, B=32 T=251 C=512 U=40): AT PARITY with
optax.ctc_loss, not faster — kernel fwd 0.69 ms + label-lattice prep
0.83 ms vs optax fwd 1.15 ms; bwd 0.63 ms + class scatter vs optax
grad 1.47 ms total.  The per-timestep cost on the VPU is dominated by
lane rotates (Mosaic ``dynamic_rotate`` ~3 ops/vreg) and logaddexp
transcendentals, NOT loop overhead (deep manual unrolling moved beta
1.16 -> 0.63 ms and then plateaued) — so a hand kernel cannot beat
XLA's already-fused while loop here.  Kept as an opt-in
(``SB_CTC_PALLAS=1``) because the implementation is exact (tests pin
fwd + grad parity) and the economics may flip on hardware with
cheaper lane shifts.  Default path: optax.

One transferable finding lives in ``_lattice_inputs``: a class-axis
``take_along_axis`` gather costs ~8 ms at these shapes on TPU; the
same gather as a one-hot matmul on the MXU costs ~0.1 ms.

This kernel keeps the whole (T, B, 2U+1) lattice in VMEM and runs the
recursion as a scalar-core ``fori_loop`` over T (manually unrolled by
``_UNROLL``): one HBM read of the gathered label lattice, one write of
alpha.

Semantics follow the standard CTC topology (Graves 2006), matching
``optax.ctc_loss`` / torch ``ctc_loss(reduction="none")`` up to the
wrapper's length normalization (reference ``nnet/losses.py:245``):

- extended state sequence  blank, y1, blank, y2, ..., yU, blank
  (S = 2U+1 states; even s = blank, odd s = label (s-1)//2)
- alpha[t, s] = lp[t, s] + logsumexp(alpha[t-1, s], alpha[t-1, s-1],
  alpha[t-1, s-2] if s odd and label[s] != label[s-2])
- loss = -logsumexp(alpha[T-1, S-1], alpha[T-1, S-2])
- d loss / d lp[t, s] = -exp(alpha[t, s] + beta[t, s] - logZ)
  with beta the suffix lattice (computed in the backward kernel, which
  emits the gradient directly; the class-axis scatter back to
  (B, T, C) runs outside the kernel as a one-hot matmul on the MXU).

Replaces the role of cuDNN/warp-ctc in the reference stack
(reference ``nnet/losses.py:195`` wraps ``torch.nn.functional.ctc_loss``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["ctc_loss_per_seq"]

NEG = -1.0e30
_BB = 8  # minimum batch rows per grid step


def _logaddexp(x, y):
    """Elementwise log(exp(x)+exp(y)) safe around the -1e30 fill."""
    m = jnp.maximum(x, y)
    d = jnp.minimum(x, y) - m
    # exp(-inf-ish) underflows to 0 cleanly; m==NEG stays NEG.
    return m + jnp.log1p(jnp.exp(d))


def _shift_right(x, k, fill):
    """x[..., s-k] along the last (lane) axis; fill the first k lanes."""
    from jax.experimental.pallas import tpu as pltpu

    S = x.shape[-1]
    rolled = pltpu.roll(x, shift=k, axis=x.ndim - 1)
    s = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(s < k, fill, rolled)


def _shift_left(x, k, fill):
    """x[..., s+k] along the last (lane) axis; fill the last k lanes."""
    from jax.experimental.pallas import tpu as pltpu

    S = x.shape[-1]
    rolled = pltpu.roll(x, shift=(S - k) % S, axis=x.ndim - 1)
    s = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(s >= S - k, fill, rolled)


_UNROLL = 25  # recursion steps per fori iteration (loop overhead amortizer)


def _alpha_kernel(lp_ref, skip_ref, alpha_ref, *, T):
    skip = skip_ref[...] > 0.5  # (Bb, S)
    s = jax.lax.broadcasted_iota(jnp.int32, skip.shape, 1)
    init = jnp.where(s <= 1, lp_ref[0], NEG)
    alpha_ref[0] = init

    def step(t, a):
        a1 = _shift_right(a, 1, NEG)
        a2 = jnp.where(skip, _shift_right(a, 2, NEG), NEG)
        a_new = _logaddexp(_logaddexp(a, a1), a2) + lp_ref[t]
        alpha_ref[t] = a_new
        return a_new

    # Manual chunked unroll (Pallas fori_loop only supports full/none).
    n_main = (T - 1) // _UNROLL

    def body(j, a):
        t0 = 1 + j * _UNROLL
        for k in range(_UNROLL):
            a = step(t0 + k, a)
        return a

    a = jax.lax.fori_loop(0, n_main, body, init)
    for t in range(1 + n_main * _UNROLL, T):  # static remainder
        a = step(t, a)


def _beta_grad_kernel(
    lp_ref, skip_ref, alpha_ref, tb_ref, sb_ref, logz_ref, grad_ref, *, T
):
    skip = skip_ref[...] > 0.5  # (Bb, S)
    s = jax.lax.broadcasted_iota(jnp.int32, skip.shape, 1)
    tb = tb_ref[...]  # (Bb, 1) int32
    sb = sb_ref[...]  # (Bb, 1) int32
    logz = logz_ref[...]  # (Bb, 1) f32
    final = jnp.where(
        (s == sb - 1) | ((s == sb - 2) & (sb >= 2)), 0.0, NEG
    )
    beta0 = jnp.full(skip.shape, NEG, jnp.float32)

    def step(t, beta):
        # Recursion from t+1 (index clamped at the top row: the result
        # there is dead — every row has either t == tb-1 -> `final`, or
        # t >= tb -> masked gradient).
        contrib = lp_ref[jnp.minimum(t + 1, T - 1)] + beta
        c2 = jnp.where(skip, contrib, NEG)
        rec = _logaddexp(
            _logaddexp(contrib, _shift_left(contrib, 1, NEG)),
            _shift_left(c2, 2, NEG),
        )
        beta_t = jnp.where(t == tb - 1, final, rec)
        post = alpha_ref[t] + beta_t - logz
        grad_ref[t] = jnp.where(t < tb, -jnp.exp(post), 0.0)
        return beta_t

    n_main = T // _UNROLL
    beta = beta0
    for t in range(T - 1, n_main * _UNROLL - 1, -1):  # static remainder
        beta = step(t, beta)

    def body(j, beta):
        t0 = n_main * _UNROLL - 1 - j * _UNROLL
        for k in range(_UNROLL):
            beta = step(t0 - k, beta)
        return beta

    jax.lax.fori_loop(0, n_main, body, beta)


def _pick_bb(B, T, S):
    """Largest batch block whose 3 (T, Bb, S) f32 slabs fit VMEM."""
    spad = (S + 127) // 128 * 128
    for bb in (32, 16, 8):
        if B % bb == 0 and 3 * T * bb * spad * 4 <= 10 * 1024 * 1024:
            return bb
    return None


def _pallas_alpha(lp_t, skip, interpret):
    T, B, S = lp_t.shape
    bb = _pick_bb(B, T, S) or _BB
    return pl.pallas_call(
        functools.partial(_alpha_kernel, T=T),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((T, bb, S), lambda b: (0, b, 0)),
            pl.BlockSpec((bb, S), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((T, bb, S), lambda b: (0, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        interpret=interpret,
    )(lp_t, skip)


def _pallas_beta_grad(lp_t, skip, alpha, tb, sb, logz, interpret):
    T, B, S = lp_t.shape
    bb = _pick_bb(B, T, S) or _BB
    return pl.pallas_call(
        functools.partial(_beta_grad_kernel, T=T),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((T, bb, S), lambda b: (0, b, 0)),
            pl.BlockSpec((bb, S), lambda b: (b, 0)),
            pl.BlockSpec((T, bb, S), lambda b: (0, b, 0)),
            pl.BlockSpec((bb, 1), lambda b: (b, 0)),
            pl.BlockSpec((bb, 1), lambda b: (b, 0)),
            pl.BlockSpec((bb, 1), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((T, bb, S), lambda b: (0, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        interpret=interpret,
    )(lp_t, skip, alpha, tb, sb, logz)


def _lattice_inputs(log_probs, targets, blank_id):
    """Gathered label lattice (B, T, S) + skip mask (B, S).

    The class-axis gather runs as a one-hot matmul on the MXU — a
    take_along_axis gather at these shapes costs ~8 ms on TPU vs
    ~0.1 ms for the (T, C) x (C, S) dot (measured, B=32 T=251 C=512
    U=40).
    """
    B, T, C = log_probs.shape
    U = targets.shape[1]
    S = 2 * U + 1
    s = jnp.arange(S)
    lab_pos = jnp.maximum((s - 1) // 2, 0)
    labels_ext = jnp.where(
        s[None, :] % 2 == 1, targets[:, lab_pos], blank_id
    )  # (B, S)
    onehot = jax.nn.one_hot(labels_ext, C, dtype=jnp.float32)  # (B, S, C)
    lp_label = jnp.einsum(
        "btc,bsc->bts",
        log_probs.astype(jnp.float32),
        onehot,
        preferred_element_type=jnp.float32,
    )  # (B, T, S)
    prev2 = jnp.roll(labels_ext, 2, axis=1)
    skip = (
        (s[None, :] % 2 == 1)
        & (s[None, :] >= 2)
        & (labels_ext != prev2)
    ).astype(jnp.float32)
    return lp_label, labels_ext, skip


def _final_loss(alpha_t, tb, sb):
    """-logsumexp of the two final lattice states at t = T_b - 1."""
    T, B, S = alpha_t.shape
    a_last = jnp.take_along_axis(
        alpha_t, (tb - 1)[None, :, None].clip(0), axis=0
    )[0]  # (B, S)
    a1 = jnp.take_along_axis(a_last, (sb - 1)[:, None].clip(0), axis=1)[:, 0]
    a2 = jnp.take_along_axis(a_last, (sb - 2)[:, None].clip(0), axis=1)[:, 0]
    a2 = jnp.where(sb >= 2, a2, NEG)
    logz = jnp.logaddexp(a1, a2)
    return -logz, logz


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ctc_pallas(log_probs, targets, lens, blank_id, interpret):
    per_seq, _ = _ctc_pallas_fwd(log_probs, targets, lens, blank_id, interpret)
    return per_seq


def _ctc_pallas_fwd(log_probs, targets, lens, blank_id, interpret):
    tb, ub = lens
    lp_label, labels_ext, skip = _lattice_inputs(
        log_probs, targets, blank_id
    )
    lp_t = jnp.transpose(lp_label, (1, 0, 2))  # (T, B, S)
    alpha_t = _pallas_alpha(lp_t, skip, interpret)
    sb = 2 * ub + 1
    per_seq, logz = _final_loss(alpha_t, tb, sb)
    # 0-row probe: carries the (static) class count + dtype into bwd.
    c_probe = jnp.empty((0, log_probs.shape[2]), log_probs.dtype)
    res = (lp_t, skip, alpha_t, labels_ext, tb, sb, logz, c_probe)
    return per_seq, res


def _ctc_pallas_bwd(blank_id, interpret, res, g):
    lp_t, skip, alpha_t, labels_ext, tb, sb, logz, c_probe = res
    C, lp_dtype = c_probe.shape[1], c_probe.dtype
    grad_t = _pallas_beta_grad(
        lp_t,
        skip,
        alpha_t,
        tb[:, None].astype(jnp.int32),
        sb[:, None].astype(jnp.int32),
        logz[:, None].astype(jnp.float32),
        interpret,
    )  # (T, B, S) d per_seq / d lp_label
    grad_label = jnp.transpose(grad_t, (1, 0, 2)) * g[:, None, None]
    onehot = jax.nn.one_hot(labels_ext, C, dtype=jnp.float32)  # (B, S, C)
    dlp = jnp.einsum(
        "bts,bsc->btc",
        grad_label,
        onehot,
        preferred_element_type=jnp.float32,
    )
    return dlp.astype(lp_dtype), None, None


_ctc_pallas.defvjp(_ctc_pallas_fwd, _ctc_pallas_bwd)


def _use_pallas(B, T, S, interpret):
    if interpret:
        return True
    import os

    # Opt-in only: measured at parity with (not faster than) optax at
    # speech shapes — see the module docstring.
    if os.environ.get("SB_CTC_PALLAS", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if B % _BB != 0:
        return False
    # 3 (T, Bb, S) f32 slabs resident per grid step
    Spad = (S + 127) // 128 * 128
    return 3 * T * _BB * Spad * 4 <= 12 * 1024 * 1024


def ctc_loss_per_seq(
    log_probs, targets, input_lengths, target_lengths, blank_id,
    interpret=False,
):
    """Per-sequence CTC negative log-likelihood (B,).

    Pallas lattice kernel on TPU; ``optax.ctc_loss`` elsewhere.  Inputs
    are (B, T, C) log-probs, (B, U) int targets, absolute int lengths.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lp = jax.nn.log_softmax(jnp.zeros((1, 4, 3)))
    >>> tgt = jnp.array([[1, 2]])
    >>> loss = ctc_loss_per_seq(lp, tgt, jnp.array([4]), jnp.array([2]), 0)
    >>> bool(loss[0] > 0)
    True
    """
    B, T, C = log_probs.shape
    U = targets.shape[1]
    S = 2 * U + 1
    tb = jnp.asarray(input_lengths, jnp.int32)
    ub = jnp.asarray(target_lengths, jnp.int32)
    if _use_pallas(B, T, S, interpret):
        return _ctc_pallas(
            log_probs, jnp.asarray(targets, jnp.int32), (tb, ub),
            blank_id, interpret,
        )
    import optax

    lp = log_probs
    tg = jnp.asarray(targets, jnp.int32)
    if blank_id != 0:
        perm = jnp.arange(C).at[0].set(blank_id).at[blank_id].set(0)
        lp = lp[..., perm]
        is_blank = tg == blank_id
        is_zero = tg == 0
        tg = jnp.where(is_blank, 0, jnp.where(is_zero, blank_id, tg))
    logit_pad = (jnp.arange(T)[None, :] >= tb[:, None]).astype(lp.dtype)
    label_pad = (jnp.arange(U)[None, :] >= ub[:, None]).astype(lp.dtype)
    return optax.ctc_loss(lp, logit_pad, tg, label_pad, blank_id=0)
