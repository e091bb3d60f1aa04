"""K-step training-trajectory parity vs the reference (torch, CPU).

The north star is WER parity, which cannot be run in this environment
(no corpus, no multi-chip).  The proxy chain is: single-step gradient
parity (test_parity_grads.py) -> THIS multi-step optimizer-trajectory
parity -> convergence.  A buglet in scheduler stepping, accumulation
boundaries, or stats-update timing passes every single-step test but
diverges over a trajectory.

Protocol (mirrors the reference transformer recipe's ``fit_batch``,
``recipes/LibriSpeech/ASR/transformer/train.py:238-270``): transplant
identical conformer CTC/attn weights into reference-torch and this
framework, run 50 Adam steps (betas 0.9/0.98, eps 1e-9, the recipe's
optimizer) over identical cycled batches with the NoamScheduler stepped
after each optimizer step, and assert per-step loss agreement.
"""

import numpy as np
import pytest

from tests.parity.conftest import to_np

import jax
import jax.numpy as jnp

N_STEPS = 50
N_BATCHES = 8
LR0 = 1e-3
WARMUP = 10  # small so the lr actually moves inside 50 steps


def t2j(t):
    # force a copy: on the CPU backend jnp.asarray can alias the
    # torch-tensor-backed numpy buffer, and torch's in-place
    # optimizer.step() would then mutate the transplanted jax params
    return jnp.asarray(np.array(to_np(t), copy=True))


def test_conformer_joint_trajectory_parity(ref, torch):
    import flax
    import optax

    from speechbrain.lobes.models.transformer.TransformerASR import (
        TransformerASR as Ref,
    )
    from speechbrain.nnet.linear import Linear as RefLinear
    from speechbrain.nnet.losses import (
        ctc_loss as ref_ctc,
        kldiv_loss as ref_kld,
    )
    from speechbrain.nnet.schedulers import NoamScheduler as RefNoam

    import speechbrain_tpu.nnet.losses as L
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR as Ours,
    )
    from speechbrain_tpu.nnet.linear import Linear as OursLinear
    from speechbrain_tpu.nnet.schedulers import NoamScheduler as OursNoam

    from tests.parity.test_parity_grads import make_conformer_transplant

    V, E, H, K = 20, 16, 2, 7
    cfg = dict(
        tgt_vocab=V,
        input_size=24,
        d_model=E,
        nhead=H,
        num_encoder_layers=2,
        num_decoder_layers=1,
        d_ffn=32,
        dropout=0.0,
        encoder_module="conformer",
        attention_type="RelPosMHAXL",
        kernel_size=K,
        positional_encoding="fixed_abs_sine",
        normalize_before=True,
        causal=False,
    )
    theirs_mod = Ref(**cfg)
    theirs_ctc = RefLinear(input_size=E, n_neurons=V)
    theirs_seq = RefLinear(input_size=E, n_neurons=V)
    theirs_mod.train()

    # ---- batches: fixed shapes, varying content/lengths, cycled -----
    rng = np.random.default_rng(417)
    B, Tsrc, U = 2, 12, 5
    batches = []
    for i in range(N_BATCHES):
        src = rng.standard_normal((B, Tsrc, 24)).astype(np.float32)
        tokens = rng.integers(1, V - 1, (B, U)).astype(np.int64)
        tokens[1, 4:] = 0  # padded row
        bos = np.full((B, 1), V - 1, np.int64)
        tokens_bos = np.concatenate([bos, tokens[:, :-1]], axis=1)
        wav_len = np.asarray([1.0, 0.75], np.float32)
        tgt_len = np.asarray([1.0, 0.8], np.float32)
        batches.append((src, tokens, tokens_bos, wav_len, tgt_len))

    # ---- transplant identical init ----------------------------------
    named = dict(theirs_mod.named_parameters(prefix="m"))
    named.update(theirs_ctc.named_parameters(prefix="ctc"))
    named.update(theirs_seq.named_parameters(prefix="seq"))
    build = make_conformer_transplant(E, H, num_encoder_layers=2)

    ours = Ours(**cfg)
    ours_ctc = OursLinear(n_neurons=V)
    ours_seq = OursLinear(n_neurons=V)
    src0, _, tokens_bos0, _, _ = batches[0]
    init = ours.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(src0),
        jnp.asarray(tokens_bos0),
    )
    weights = build(lambda n: t2j(named[n].data))
    init_flat = flax.traverse_util.flatten_dict(init["params"], sep="/")
    w_flat = flax.traverse_util.flatten_dict(weights["asr"], sep="/")
    src_keys = [k for k in init_flat if k.startswith("custom_src_module")]
    kkey = [k for k in src_keys if k.endswith("kernel")][0]
    bkey = [k for k in src_keys if k.endswith("bias")][0]
    w_flat[kkey] = t2j(named["m.custom_src_module.layers.0.w.weight"].data).T
    w_flat[bkey] = t2j(named["m.custom_src_module.layers.0.w.bias"].data)
    emb_key = [k for k in init_flat if k.startswith("custom_tgt_module")][0]
    w_flat[emb_key] = t2j(
        named["m.custom_tgt_module.layers.0.emb.Embedding.weight"].data
    )
    assert set(w_flat) == set(init_flat)
    params = {
        "asr": flax.traverse_util.unflatten_dict(w_flat, sep="/"),
        "ctc_head": weights["ctc_head"],
        "seq_head": weights["seq_head"],
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # ---- torch side: Adam + Noam exactly as the recipe fit_batch ----
    t_opt = torch.optim.Adam(
        list(theirs_mod.parameters())
        + list(theirs_ctc.parameters())
        + list(theirs_seq.parameters()),
        lr=LR0,
        betas=(0.9, 0.98),
        eps=1e-9,
    )
    t_sched = RefNoam(lr_initial=LR0, n_warmup_steps=WARMUP)

    def torch_loss(batch):
        src, tokens, tokens_bos, wav_len, tgt_len = batch
        enc, dec = theirs_mod(
            torch.tensor(src),
            torch.tensor(tokens_bos),
            torch.tensor(wav_len),
        )
        p_ctc = torch.log_softmax(theirs_ctc(enc), dim=-1)
        p_seq = torch.log_softmax(theirs_seq(dec), dim=-1)
        return 0.3 * ref_ctc(
            p_ctc,
            torch.tensor(tokens),
            torch.tensor(wav_len),
            torch.tensor(tgt_len),
            blank_index=0,
            reduction="batchmean",
        ) + 0.7 * ref_kld(
            p_seq,
            torch.tensor(tokens),
            torch.tensor(tgt_len),
            label_smoothing=0.1,
            reduction="batchmean",
        )

    # ---- our side: optax.adam + our Noam, stepped identically -------
    o_opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=LR0, b1=0.9, b2=0.98, eps=1e-9
    )
    o_state = o_opt.init(params)
    o_sched = OursNoam(lr_initial=LR0, n_warmup_steps=WARMUP)

    def our_loss(p, batch):
        src, tokens, tokens_bos, wav_len, tgt_len = batch
        enc_o, dec_o = ours.apply(
            {"params": p["asr"]},
            jnp.asarray(src),
            jnp.asarray(tokens_bos),
            wav_len=jnp.asarray(wav_len),
            train=True,
            rngs={"dropout": jax.random.PRNGKey(4)},
        )
        lp_ctc = jax.nn.log_softmax(
            ours_ctc.apply({"params": p["ctc_head"]}, enc_o), axis=-1
        )
        lp_seq = jax.nn.log_softmax(
            ours_seq.apply({"params": p["seq_head"]}, dec_o), axis=-1
        )
        return 0.3 * L.ctc_loss(
            lp_ctc, tokens, wav_len, tgt_len, blank_index=0,
            reduction="batchmean",
        ) + 0.7 * L.kldiv_loss(
            lp_seq, tokens, tgt_len, label_smoothing=0.1,
            reduction="batchmean",
        )

    grad_fn = jax.jit(jax.value_and_grad(our_loss))

    t_losses, o_losses = [], []
    for step in range(N_STEPS):
        batch = batches[step % N_BATCHES]
        # torch fit_batch: forward/backward, step, zero, THEN anneal
        t_opt.zero_grad()
        t_loss = torch_loss(batch)
        t_loss.backward()
        t_opt.step()
        t_sched(t_opt)
        t_losses.append(float(t_loss))

        o_loss, grads = grad_fn(params, batch)
        updates, o_state = o_opt.update(grads, o_state, params)
        params = optax.apply_updates(params, updates)
        _, new_lr = o_sched()
        o_state.hyperparams["learning_rate"] = jnp.asarray(
            new_lr, dtype=o_state.hyperparams["learning_rate"].dtype
        )
        o_losses.append(float(o_loss))

    t_losses = np.asarray(t_losses)
    o_losses = np.asarray(o_losses)
    # scheduler parity over the whole run: the lr actually applied to
    # the optimizers after N_STEPS anneals must agree exactly
    np.testing.assert_allclose(
        t_opt.param_groups[0]["lr"],
        float(o_state.hyperparams["learning_rate"]),
        rtol=1e-6,  # ours is stored f32 in the optax hyperparams
    )
    # per-step loss agreement; f32 round-off compounds over 50 steps,
    # so the tolerance is tight early and looser late
    for s in range(N_STEPS):
        rtol = 2e-3 if s < 10 else (5e-3 if s < 30 else 1.5e-2)
        np.testing.assert_allclose(
            o_losses[s],
            t_losses[s],
            rtol=rtol,
            err_msg=f"trajectory diverged at step {s}: "
            f"ours={o_losses[s]:.6f} torch={t_losses[s]:.6f}",
        )
    # both trajectories actually trained (loss moved meaningfully)
    assert t_losses[-1] < t_losses[0]
    assert o_losses[-1] < o_losses[0]


def _torch_rnnt_nll(torch, logp, targets, t_lens, u_lens):
    """Pure-torch (Numba-free) RNN-T forward with the reference CUDA
    kernel's exact semantics (``nnet/loss/transducer_loss.py:34-110``):
    log-space alpha over the (T, U+1) lattice,
    ``ll = alpha[T-1, U] + blank(T-1, U)`` normalized per-utterance by
    T (``transducer_loss.py:104-106``).  Autograd supplies gradients —
    the oracle for the scan/Pallas backends' trajectory."""
    B = logp.shape[0]
    losses = []
    for b in range(B):
        Tb, Ub = int(t_lens[b]), int(u_lens[b])
        alpha = [
            [None] * (Ub + 1) for _ in range(Tb)
        ]
        for t in range(Tb):
            for u in range(Ub + 1):
                if t == 0 and u == 0:
                    alpha[t][u] = logp.new_zeros(())
                    continue
                cands = []
                if t > 0:
                    cands.append(
                        alpha[t - 1][u] + logp[b, t - 1, u, 0]
                    )
                if u > 0:
                    cands.append(
                        alpha[t][u - 1]
                        + logp[b, t, u - 1, int(targets[b, u - 1])]
                    )
                alpha[t][u] = torch.logsumexp(torch.stack(cands), 0)
        ll = alpha[Tb - 1][Ub] + logp[b, Tb - 1, Ub, 0]
        losses.append(-ll / Tb)
    return torch.stack(losses).mean()


def test_transducer_trajectory_parity(ref, torch):
    """30-step Adam trajectory through the transducer loss kernel.

    The conformer trajectory test covers CTC/attn; the transducer
    recipe exercises a different loss kernel (the scan formulation on
    CPU — the same lattice the Pallas kernel computes, pinned equal by
    tests/unittests/test_pallas_transducer.py), the joint network, and
    the per-T normalization convention.  A divergence bug in any of
    them passes every single-step test but drifts over a trajectory.

    Model: Linear encoder + (Embedding -> LSTM) prediction net +
    sum/tanh joint + output Linear, transplanted weights, variable
    t/u lengths (masking exercised), torch SGD+momentum vs optax.sgd
    (Adam's first-step sign normalization amplifies f32 rounding on
    near-zero-gradient elements to ~lr per element — measured 1e-3
    loss drift by step 1 — while the SGD trajectory isolates kernel
    semantics; Adam/Noam stepping parity is covered by the conformer
    trajectory test above).
    """
    import optax

    from speechbrain_tpu.nnet.RNN import LSTM as OursLSTM
    from speechbrain_tpu.nnet.embedding import Embedding as OursEmb
    from speechbrain_tpu.nnet.linear import Linear as OursLinear
    from speechbrain_tpu.nnet.loss.transducer_loss import TransducerLoss
    from speechbrain_tpu.nnet.transducer.transducer_joint import (
        Transducer_joint,
    )

    V, F, H = 8, 6, 10
    B, T, U = 2, 8, 4
    STEPS = 30
    LR = 5e-3

    rng = np.random.default_rng(97)
    n_batches = 4
    batches = []
    for i in range(n_batches):
        feats = rng.standard_normal((B, T, F)).astype(np.float32)
        targets = rng.integers(1, V, (B, U)).astype(np.int64)
        t_lens = np.asarray([T, T - 2], np.int32)
        u_lens = np.asarray([U, U - 1], np.int32)
        batches.append((feats, targets, t_lens, u_lens))

    # ---- torch side --------------------------------------------------
    t_enc = torch.nn.Linear(F, H)
    t_emb = torch.nn.Embedding(V, H)
    t_lstm = torch.nn.LSTM(H, H, batch_first=True)
    t_out = torch.nn.Linear(H, V)
    t_params = (
        list(t_enc.parameters())
        + list(t_emb.parameters())
        + list(t_lstm.parameters())
        + list(t_out.parameters())
    )

    def torch_loss(batch):
        feats, targets, t_lens, u_lens = batch
        enc = t_enc(torch.tensor(feats))  # (B, T, H)
        tok = torch.tensor(
            np.concatenate(
                [np.zeros((B, 1), np.int64), targets], axis=1
            )
        )
        pred, _ = t_lstm(t_emb(tok))  # (B, U+1, H)
        joint = torch.tanh(enc[:, :, None, :] + pred[:, None, :, :])
        logp = torch.log_softmax(t_out(joint), dim=-1)
        return _torch_rnnt_nll(torch, logp, targets, t_lens, u_lens)

    # ---- our side: transplanted params ------------------------------
    o_enc = OursLinear(n_neurons=H)
    o_emb = OursEmb(num_embeddings=V, embedding_dim=H)
    o_lstm = OursLSTM(hidden_size=H, num_layers=1)
    o_joint = Transducer_joint(joint="sum")
    o_out = OursLinear(n_neurons=V)
    loss_mod = TransducerLoss(
        blank_index=0, normalize_by_T=True, use_pallas=False
    )

    params = {
        "enc": {
            "Dense_0": {
                "kernel": t2j(t_enc.weight).T,
                "bias": t2j(t_enc.bias),
            }
        },
        "emb": {"Embed_0": {"embedding": t2j(t_emb.weight)}},
        "pred": {
            "l0_wx": {
                "kernel": t2j(t_lstm.weight_ih_l0).T,
                "bias": t2j(t_lstm.bias_ih_l0) + t2j(t_lstm.bias_hh_l0),
            },
            "l0_u": t2j(t_lstm.weight_hh_l0).T,
        },
        "out": {
            "Dense_0": {
                "kernel": t2j(t_out.weight).T,
                "bias": t2j(t_out.bias),
            }
        },
    }
    feats0, targets0, _, _ = batches[0]
    tok0 = np.concatenate([np.zeros((B, 1), np.int64), targets0], 1)
    # structure check: transplant keys == module-init keys
    import flax

    for mod, sub, args in (
        (o_enc, "enc", (jnp.asarray(feats0),)),
        (o_emb, "emb", (jnp.asarray(tok0),)),
        (o_lstm, "pred", (jnp.zeros((B, U + 1, H)),)),
        (o_out, "out", (jnp.zeros((B, T, U + 1, H)),)),
    ):
        init = mod.init(jax.random.PRNGKey(0), *args)
        assert set(
            flax.traverse_util.flatten_dict(init["params"])
        ) == set(flax.traverse_util.flatten_dict(params[sub])), sub
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def our_loss(p, batch):
        feats, targets, t_lens, u_lens = batch
        enc = o_enc.apply({"params": p["enc"]}, jnp.asarray(feats))
        tok = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), jnp.asarray(targets, jnp.int32)],
            axis=1,
        )
        emb = o_emb.apply({"params": p["emb"]}, tok)
        pred, _ = o_lstm.apply({"params": p["pred"]}, emb)
        joint = o_joint.apply({}, enc, pred)
        logits = o_out.apply({"params": p["out"]}, joint)
        return loss_mod(
            logits, targets, jnp.asarray(t_lens), jnp.asarray(u_lens)
        ).mean()

    grad_fn = jax.jit(jax.value_and_grad(our_loss))

    t_opt = torch.optim.SGD(t_params, lr=LR, momentum=0.9)
    o_opt = optax.sgd(LR, momentum=0.9)
    o_state = o_opt.init(params)

    t_losses, o_losses = [], []
    for step in range(STEPS):
        batch = batches[step % n_batches]
        t_opt.zero_grad()
        t_loss = torch_loss(batch)
        t_loss.backward()
        t_opt.step()
        t_losses.append(float(t_loss.detach()))

        o_loss, grads = grad_fn(params, batch)
        updates, o_state = o_opt.update(grads, o_state, params)
        params = optax.apply_updates(params, updates)
        o_losses.append(float(o_loss))

    t_losses = np.asarray(t_losses)
    o_losses = np.asarray(o_losses)
    # measured drift: identical at step 0, ~3e-3 worst late step (f32
    # rounding through ~30 steps at effective lr 0.05); a
    # normalization-convention or lattice bug is O(1)
    for s in range(STEPS):
        rtol = 2e-3 if s < 10 else 1e-2
        np.testing.assert_allclose(
            o_losses[s],
            t_losses[s],
            rtol=rtol,
            err_msg=f"transducer trajectory diverged at step {s}: "
            f"ours={o_losses[s]:.6f} torch={t_losses[s]:.6f}",
        )
    assert t_losses[-1] < t_losses[0]
    assert o_losses[-1] < o_losses[0]
