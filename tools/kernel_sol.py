#!/usr/bin/env python3
"""Kernel speed-of-light audit (BASELINE.md north star: kernel-level
speed-of-light targets for frontend, losses, attention).

For each hot kernel at bench shapes, measures wall time on the chip —
K chained iterations inside ONE jitted ``lax.scan`` so per-dispatch
tunnel overhead amortizes and XLA cannot hoist the loop-invariant
kernel (each iteration's carry is perturbed by the previous output) —
then pulls FLOPs and HBM traffic from XLA cost analysis and compares
against the roofline bound::

    t_sol = max(flops / peak_flops, bytes / hbm_bw)

``pct_sol = t_sol / t_measured`` (100% = at the hardware bound; the
bound ignores VPU transcendentals / layout copies so low-arithmetic
kernels structurally sit below it).

Usage: ``python tools/kernel_sol.py [--iters 32] [--out docs/speed_of_light.md]``
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import numpy as np

# published per-chip peaks by jax device_kind prefix:
# (bf16 FLOP/s, HBM bytes/s)
PEAKS = {
    "TPU v4": (275e12, 1.23e12),
    "TPU v5 lite": (197e12, 8.19e11),
    "TPU v5e": (197e12, 8.19e11),
    "TPU v5p": (459e12, 2.77e12),
    "TPU v5": (459e12, 2.77e12),
    "TPU v6e": (918e12, 1.64e12),
    "cpu": (1e11, 5e10),  # nominal, so the tool runs anywhere
}


def _chain(fn, args, iters):
    """jitted scan of ``iters`` dependent evaluations of fn(*args)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def body(carry, _):
        out = fn(*carry)
        bump = 0.0
        for leaf in jax.tree_util.tree_leaves(out):
            bump = bump + jnp.sum(leaf).astype(jnp.float32) * 1e-30
        carry = jax.tree_util.tree_map(
            lambda a: a + bump.astype(a.dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else a,
            carry,
        )
        return carry, ()

    return jax.jit(
        lambda c: lax.scan(body, c, None, length=iters)[0]
    ), args


def measure(name, fn, args, iters=32, reps=3):
    """-> dict(name, ms, flops, bytes, sol_ms, pct_sol)."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    run, cargs = _chain(fn, args, iters)
    out = run(cargs)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(cargs)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)

    kind = jax.devices()[0].device_kind
    # longest-prefix match so e.g. "TPU v5 lite" beats "TPU v5"
    # regardless of dict insertion order; warn on unknown devices
    # instead of silently attributing the nominal cpu peaks
    matches = sorted(
        (k for k in PEAKS if kind.startswith(k)), key=len, reverse=True
    )
    if matches:
        peak_f, peak_b = PEAKS[matches[0]]
    else:
        peak_f, peak_b = PEAKS["cpu"]
        print(
            f"WARNING: unknown device_kind {kind!r}; falling back to "
            "nominal cpu peaks — pct_sol is not meaningful",
            file=sys.stderr,
        )
    sol = max(flops / peak_f, byts / peak_b) if (flops or byts) else None
    return {
        "name": name,
        "ms": round(best * 1e3, 3),
        "gflops": round(flops / 1e9, 2),
        "mbytes": round(byts / 1e6, 1),
        "sol_ms": round(sol * 1e3, 3) if sol else None,
        "pct_sol": round(100 * sol / best, 1) if sol else None,
        "bound": (
            "compute" if flops / peak_f >= byts / peak_b else "memory"
        )
        if (flops or byts)
        else None,
    }


def build_cases():
    """Hot kernels at bench shapes (conformer_small training class)."""
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.lobes.features import Fbank
    from speechbrain_tpu.nnet.attention import RelPosEncXL, RelPosMHAXL
    from speechbrain_tpu.nnet.losses import ctc_loss, transducer_loss
    from speechbrain_tpu.ops.pallas.depthwise_conv import depthwise_conv1d

    rng = np.random.default_rng(0)
    cases = []

    # 1. frontend: Fbank (fused-conv MXU STFT), B=32 x 10 s
    fb = Fbank(n_mels=80, mxu_dtype=jnp.bfloat16)
    wav = jnp.asarray(
        rng.standard_normal((32, 160000)).astype(np.float32)
    )
    cases.append(("fbank_fwd B=32x10s", lambda w: fb(w), (wav,)))

    # 2. attention: RelPosMHAXL fwd+grad at encoder shapes
    B, T, D, H = 32, 251, 144, 4
    mha = RelPosMHAXL(embed_dim=D, num_heads=H)
    x = jnp.asarray(
        rng.standard_normal((B, T, D)).astype(np.float32), jnp.bfloat16
    )
    pe = RelPosEncXL(emb_dim=D)(x)
    params = mha.init(jax.random.PRNGKey(0), x, x, x, pe)

    def attn_loss(p, xx):
        out, _ = mha.apply(p, xx, xx, xx, pe, train=False)
        return jnp.sum(jnp.asarray(out, jnp.float32))

    attn_vg = jax.value_and_grad(attn_loss, argnums=(0, 1))
    cases.append(
        (
            f"relpos_mha_fwd_bwd B={B} T={T} d={D}",
            lambda p, xx: attn_vg(p, xx),
            (params, x),
        )
    )

    # 3. CTC loss fwd+grad (post-log-softmax input, BPE-5000 head)
    V = 5000
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    )
    tgt = jnp.asarray(rng.integers(1, V, (B, 60)), jnp.int32)
    ones = jnp.ones((B,))

    def ctc_f(lp):
        return ctc_loss(lp, tgt, ones, ones, blank_index=0)

    cases.append(
        (
            f"ctc_fwd_bwd B={B} T={T} V={V}",
            jax.value_and_grad(ctc_f),
            (logp,),
        )
    )

    # 4. transducer lattice (Pallas) fwd+grad
    Bt, Tt, U, Vt = 16, 200, 50, 512
    logits = jnp.asarray(
        rng.standard_normal((Bt, Tt, U + 1, Vt)).astype(np.float32)
    )
    tgt_t = jnp.asarray(rng.integers(1, Vt, (Bt, U)), jnp.int32)
    ones_t = jnp.ones((Bt,))

    def trans_f(lg):
        return transducer_loss(
            lg, tgt_t, ones_t, ones_t, blank_index=0, use_pallas=True
        )

    cases.append(
        (
            f"transducer_fwd_bwd B={Bt} T={Tt} U={U} V={Vt}",
            jax.value_and_grad(trans_f),
            (logits,),
        )
    )

    # 5. Pallas depthwise conv fwd+grad (conformer conv module).
    # At bench batch (B=32) the whole working set is ~2.3 MB and stays
    # VMEM-resident across the chained timing loop, so the loop never
    # touches HBM and the HBM roofline is the wrong bound; B=512 forces
    # the streaming (HBM-bound) regime the kernel sees in-graph.
    K, C, Bd = 31, 144, 512
    xc = jnp.asarray(
        rng.standard_normal((Bd, T, C)).astype(np.float32), jnp.bfloat16
    )
    wc = jnp.asarray(
        rng.standard_normal((K, C)).astype(np.float32), jnp.bfloat16
    )

    def dw_f(xx, ww):
        return jnp.sum(
            jnp.asarray(depthwise_conv1d(xx, ww), jnp.float32)
        )

    cases.append(
        (
            f"depthwise_conv_fwd_bwd B={Bd} K={K} C={C}",
            jax.value_and_grad(dw_f, argnums=(0, 1)),
            (xc, wc),
        )
    )
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--out", default=None, help="also write markdown")
    args = ap.parse_args()

    import jax

    kind = jax.devices()[0].device_kind
    rows = []
    for name, fn, fargs in build_cases():
        try:
            rows.append(measure(name, fn, fargs, iters=args.iters))
            print(f"# {rows[-1]}", file=sys.stderr)
        except Exception as e:  # keep going: one kernel, one verdict
            print(f"# {name} failed: {e!r}", file=sys.stderr)
    print(json.dumps({"device_kind": kind, "kernels": rows}))

    if args.out:
        lines = [
            "# Kernel speed-of-light audit",
            "",
            f"Device: {kind}.  Generated by `tools/kernel_sol.py`"
            " (roofline = max(flops/peak, bytes/HBM-bw); 100% = at the",
            "hardware bound; low-arithmetic kernels sit structurally",
            "below it — VPU transcendentals and layout copies are not",
            "in the bound).",
            "",
            "Methodology: K dependent iterations chained inside one",
            "jitted `lax.scan` (amortizes dispatch; defeats hoisting),",
            "FLOPs/bytes from XLA cost analysis of the single call.",
            "Caveat: a kernel whose whole working set fits in VMEM",
            "(~16 MB) stays VMEM-resident across the loop and beats the",
            "HBM roofline artificially — such cases are sized up to the",
            "streaming regime (see depthwise).  Cross-check: fbank /",
            "attention / transducer here match the in-graph step",
            "profile in PERFORMANCE.md within ~10%.",
            "",
            "| kernel | measured ms | GFLOPs | MB moved | SoL ms |"
            " % of SoL | bound |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['name']} | {r['ms']} | {r['gflops']} |"
                f" {r['mbytes']} | {r['sol_ms']} | {r['pct_sol']} |"
                f" {r['bound']} |"
            )
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
