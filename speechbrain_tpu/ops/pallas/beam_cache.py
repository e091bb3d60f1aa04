"""Pallas TPU fused beam-search self-cache engine.

The inner loop of batched beam search permutes every decoder layer's
self-attention KV cache by the predecessor rows, appends the new
token's K/V, and attends the query over the result.  Expressed as
separate XLA ops (gather + dynamic-update-slice + reductions) each
cache is streamed through HBM up to three times per step at measured
15-27% of HBM speed-of-light (PERFORMANCE.md round 4: 36% of the whole
search program was DUS copies, 32% attention reductions).

This kernel fuses the three into ONE pass per (beam, layer): the
predecessor's merged K|V row is DMA'd once (scalar-prefetch block
index — the permutation IS the block index map), the new K/V columns
are masked in, scores/softmax/context are computed on the
VMEM-resident block, and the permuted+appended row is written back —
each cache byte crosses HBM exactly once in and once out, in exactly
TWO large contiguous DMAs per beam (descriptor issue overhead, not
bandwidth, dominated a first per-operand-blocked version: 8 small
DMAs per grid step ran at 22% of the HBM roofline).

Layout: caches are TIME-MINOR merged K|V ``(n, H*Dh, 2L)`` — feature
rows map to sublanes (H*Dh = 144 for the conformer-small decoder: 9
full bf16 sublane tiles), K occupies lanes [0, L), V lanes [L, 2L)
(each L padded to the next 128 multiple, ~2% at L=251).  The
reference layout ``(n, L, H, Dh)`` puts (H, Dh) = (4, 36) on the
tiled minor dims, wasting most of each (16, 128) tile.

Replaces the cache-reordering role of the reference's
``torch.index_select`` beam bookkeeping (reference
``decoders/seq2seq.py:744-756``) with a TPU-native fused kernel.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["beam_attend_step", "append_attend"]

_NEG = -1e30
# Read once at import: under jit the value is baked into the cached
# trace anyway, so a mid-process env change would be silently ignored
# — make that explicit (advisor r4).
_GMAX_ENV = int(os.environ.get("SB_BEAM_CACHE_G", "8"))
# Per-grid-step VMEM budget for the G-beam blocks (v5e VMEM is 16 MiB;
# leave half for double-buffering, scratch and the resident operands).
_VMEM_BUDGET = 8 * 1024 * 1024


def _kernel(rows_ref, pos_ref, qr_ref, kvn_ref, *refs, H, Dh, L, G,
            has_dst):
    kv_refs = refs[:G]
    # has_dst: a dummy aliased destination operand sits between the kv
    # blocks and the outputs; it is never read (the kvo output writes
    # land in its HBM buffer via input_output_aliases).
    ctx_ref = refs[G + (1 if has_dst else 0)]
    kvo_ref = refs[G + (2 if has_dst else 1)]  # (G, HD, 2L) out rows
    i = pl.program_id(0)
    pos = pos_ref[0]
    HD = H * Dh
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * L), 1)
    lane = lane2[:1, :L]

    # Head-assignment masks.  The per-head score reduction becomes ONE
    # MXU matmul with a block-diagonal query matrix (bf16 x bf16
    # products accumulate exactly in f32), and the context another —
    # VPU op-issue count over the (HD, 2L) block, not math, limited
    # the elementwise formulation.
    hh = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
    rr = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1)
    # 0/1 multiplies instead of where(): i1->bf16 mask relayouts
    # across broadcasts are a Mosaic sore spot; x1.0/x0.0 is exact.
    head_mask = (rr // Dh == hh).astype(kv_refs[0].dtype)  # (H, HD)
    hh_t = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 1)
    rr_t = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 0)
    head_mask_t = (rr_t // Dh == hh_t).astype(jnp.float32)  # (HD, H)

    for j in range(G):
        qr = qr_ref[i * G + j]  # (1, HD) pre-scaled query row
        kvn = kvn_ref[i * G + j]  # (HD, 2) new K|V columns
        kn = kvn[:, 0:1]
        vn = kvn[:, 1:2]

        # Append the new K/V columns in the cache dtype (old entries
        # pass through bit-exactly; the new columns are cache-dtype).
        blk = kv_refs[j][0]  # (HD, 2L), predecessor row via prefetch
        blk = jnp.where(lane2 == pos, kn, blk)
        blk = jnp.where(lane2 == L + pos, vn, blk)
        kvo_ref[j] = blk

        # Block-diagonal query (H, HD): row h holds q's head-h slice.
        qbd = head_mask * qr
        s = jax.lax.dot_general(
            qbd, blk[:, :L], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, L) per-head scores, exact f32 accumulation
        s = jnp.where(lane > pos, _NEG, s)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)  # (H, L) f32
        c = jax.lax.dot_general(
            blk[:, L:], p.astype(blk.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (HD, H): head-h context in column h
        ctx_ref[i * G + j] = jnp.sum(
            c * head_mask_t, axis=1, keepdims=True
        )  # (HD, 1)


def _pallas_call(kv, rows, pos_arr, q_rows, kv_new, H, interpret,
                 dst=None):
    n, HD, L2 = kv.shape
    L = L2 // 2
    Dh = HD // H
    # One (1, HD, 2L) in-block per beam plus the (G, HD, 2L) out block
    # live in VMEM per grid step: 2 * G * HD * 2L * itemsize bytes.
    step_bytes = lambda g: 2 * g * HD * L2 * kv.dtype.itemsize
    G = next(
        g
        for g in (8, 4, 2, 1)
        if n % g == 0
        and g <= _GMAX_ENV
        and (step_bytes(g) <= _VMEM_BUDGET or g == 1)
    )
    kv_spec = [
        pl.BlockSpec(
            (1, HD, L2),
            functools.partial(
                lambda j, i, rows, pos: (rows[i * G + j], 0, 0), j
            ),
        )
        for j in range(G)
    ]
    # Optional ping-pong destination: `dst` is a SEPARATE buffer of
    # the cache's shape that the permuted+appended output is written
    # into IN PLACE (input_output_aliases).  Unlike aliasing the cache
    # being read (measured corrupting — beam permutations are
    # many-to-one, so some grid step always overwrites a row a later
    # step still reads), writing into a disjoint buffer has no
    # read-after-write hazard; the searcher carries (A, B) buffers and
    # alternates roles every step (unrolled by 2 for positional carry
    # stability), letting XLA keep the while-loop cache state fully
    # in place — no per-step full-cache carry copies.
    dst_spec = (
        []
        if dst is None
        # never read in-kernel: a single constant-index block is
        # fetched once for the whole grid (one row of overhead).
        else [pl.BlockSpec((1, HD, L2), lambda i, rows, pos: (0, 0, 0))]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rows, pos
        grid=(n // G,),
        in_specs=[
            # q rows / new-KV columns: constant index maps — fetched
            # ONCE and kept VMEM-resident across the whole grid.
            pl.BlockSpec((n, 1, HD), lambda i, rows, pos: (0, 0, 0)),
            pl.BlockSpec((n, HD, 2), lambda i, rows, pos: (0, 0, 0)),
            # Merged K|V rows of the predecessors: ONE contiguous DMA
            # per beam; G beams per grid step amortize step overhead.
            *kv_spec,
            *dst_spec,
        ],
        out_specs=[
            # ctx: resident accumulator, written back once at the end.
            pl.BlockSpec((n, HD, 1), lambda i, rows, pos: (0, 0, 0)),
            # Output rows are CONSECUTIVE (i*G+j): one fat block —
            # and one fat write DMA — per grid step.
            pl.BlockSpec(
                (G, HD, L2), lambda i, rows, pos: (i, 0, 0)
            ),
        ],
    )
    operands = [rows, pos_arr, q_rows, kv_new, *([kv] * G)]
    aliases = {}
    if dst is not None:
        # flat input index of dst (scalar-prefetch args included) ->
        # kvo output index.
        aliases = {len(operands): 1}
        operands.append(dst)
    ctx, kvo = pl.pallas_call(
        functools.partial(
            _kernel, H=H, Dh=Dh, L=L, G=G, has_dst=dst is not None
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, HD, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, HD, L2), kv.dtype),
        ],
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    return ctx[..., 0], kvo


def append_attend(kv, pos, q, k_new, v_new, H):
    """Column append + causal attend over a merged time-minor cache,
    in plain XLA (no beam permutation): the semantic reference for the
    kernel and the plain (non-beam) incremental-decode path."""
    n, HD, L2 = kv.shape
    L = L2 // 2
    Dh = HD // H
    lane2 = jnp.arange(L2)
    kv = jnp.where((lane2 == pos)[None, None, :], k_new[..., None], kv)
    kv = jnp.where(
        (lane2 == L + pos)[None, None, :], v_new[..., None], kv
    )
    lane = lane2[:L]
    kf = kv[:, :, :L].reshape(n, H, Dh, L).astype(jnp.float32)
    vf = kv[:, :, L:].reshape(n, H, Dh, L).astype(jnp.float32)
    qf = q.reshape(n, H, Dh).astype(jnp.float32)
    s = jnp.einsum("nhd,nhdl->nhl", qf, kf)
    s = jnp.where((lane > pos)[None, None, :], _NEG, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.einsum("nhl,nhdl->nhd", p, vf).reshape(n, HD)
    return out, kv


def _xla_ref(kv, rows, pos, q, k_new, v_new, H):
    """Reference/fallback path: same math as the kernel in plain XLA."""
    kv = jnp.take(kv, rows, axis=0)
    return append_attend(kv, pos, q, k_new, v_new, H)


def beam_attend_step(kv, rows, q, k_new, v_new, pos, nhead,
                     interpret=False, dst=None):
    """Fused permute + append + self-attend over a time-minor merged
    K|V cache.

    Arguments
    ---------
    kv : (n, H*Dh, 2L) cache (any float dtype); K at lanes [0, L),
        V at lanes [L, 2L), time minor.
    rows : (n,) int32 predecessor rows — output row i is built from
        cache row ``rows[i]``.
    q : (n, H*Dh) PRE-SCALED query (multiply by 1/sqrt(Dh) upstream).
    k_new, v_new : (n, H*Dh) this step's K/V, written at lane ``pos``
        (K half) and ``L + pos`` (V half).
    pos : scalar int32 decode position; lanes > pos are masked.
    nhead : number of attention heads H.
    interpret : run the Pallas kernel in interpret mode (CPU tests).
    dst : optional (n, H*Dh, 2L) buffer of the cache's shape/dtype.
        When given (ping-pong decode), the returned cache is written
        into ``dst``'s buffer in place (``input_output_aliases``);
        ``dst``'s CONTENTS are ignored and destroyed.  ``dst`` must be
        a different buffer than ``kv`` — aliasing the read cache
        itself is unsound (see PERFORMANCE.md round 5).

    Returns
    -------
    (out, kv_new) : (n, H*Dh) float32 context and the
    permuted+appended cache (input dtype).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> kv = jnp.zeros((2, 4, 16))
    >>> r = jnp.array([1, 0]); t = jnp.ones((2, 4))
    >>> o, kv2 = beam_attend_step(kv, r, t, t, t,
    ...     jnp.asarray(0, jnp.int32), 2)
    >>> o.shape, kv2.shape
    ((2, 4), (2, 4, 16))
    """
    rows = jnp.asarray(rows, jnp.int32)
    pos = jnp.asarray(pos, jnp.int32)
    q = q.astype(kv.dtype)
    k_new = k_new.astype(kv.dtype)
    v_new = v_new.astype(kv.dtype)
    use_pallas = interpret or jax.default_backend() == "tpu"
    if not use_pallas:
        # dst is a buffer-placement hint only; the XLA fallback
        # computes the same values in a fresh buffer.
        return _xla_ref(kv, rows, pos, q, k_new, v_new, nhead)
    q_rows = q[:, None, :]  # (n, 1, HD)
    kv_new = jnp.stack([k_new, v_new], axis=-1)  # (n, HD, 2)
    out, kv2 = _pallas_call(
        kv, rows, pos[None], q_rows, kv_new, nhead, interpret, dst=dst
    )
    return out, kv2
