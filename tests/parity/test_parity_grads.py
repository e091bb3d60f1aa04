"""Gradient-level parity vs the torch reference (training path).

Round-1 parity ran the reference under ``torch.no_grad()`` — forward
only.  This suite compares the *training* path: ``jax.grad`` against
``torch.autograd`` on identical inputs (and, for whole-model steps,
transplanted weights), the strongest offline proxy for end-task WER
parity (reference fit_batch semantics, ``core.py:882-994``).

Two tiers:

1. Loss gradients — for every loss in ``nnet/losses.py`` the gradient
   of the scalar loss w.r.t. the network output (log-probs / logits /
   signals) must match ``torch.autograd.grad`` on the reference loss.
2. Whole-model train steps — CRDNN+CTC and TransformerASR joint
   CTC/attention: transplant weights, run one loss computation in
   train mode on both sides, compare the loss value and EVERY
   parameter gradient (torch grads mapped through the same transplant
   transforms as the weights).

The reference transducer loss is CUDA-Numba-only
(``nnet/loss/transducer_loss.py:34-238`` — skipped on CPU in the
reference's own CI), so its oracle here is a line-faithful pure-torch
transcription of that kernel's recurrence (same log-space lattice,
same per-T normalization), differentiated by torch autograd.
"""

import numpy as np
import pytest

from tests.parity.conftest import assert_close, to_np

import jax
import jax.numpy as jnp


def t2j(t):
    return jnp.asarray(to_np(t))


def grads_close(ours, theirs, rtol=2e-3, atol=2e-5, what=""):
    a, b = to_np(ours), to_np(theirs)
    assert a.shape == b.shape, f"{what}: {a.shape} vs {b.shape}"
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=what)


# ---------------------------------------------------------------------------
# Tier 1: loss gradients
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def loss_data():
    rng = np.random.default_rng(41)
    B, T, C = 4, 12, 7
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    targets = rng.integers(1, C, (B, T)).astype(np.int64)
    lengths = np.asarray([1.0, 0.75, 0.5, 1.0], dtype=np.float32)
    return logits, targets, lengths


def _torch_grad(torch, fn, *args, wrt=0):
    """Scalar loss fn gradient w.r.t. args[wrt] via torch autograd."""
    t_args = [torch.tensor(a) for a in args]
    t_args[wrt].requires_grad_(True)
    loss = fn(*t_args)
    loss.backward()
    return loss.detach(), t_args[wrt].grad


@pytest.mark.parametrize("reduction", ["mean", "batchmean"])
def test_grad_ctc_loss(ref, torch, reduction):
    from speechbrain.nnet.losses import ctc_loss as ref_ctc
    import speechbrain_tpu.nnet.losses as L

    rng = np.random.default_rng(42)
    B, T, C, U = 3, 16, 6, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    targets = rng.integers(1, C, (B, U)).astype(np.int64)
    in_lens = np.asarray([1.0, 0.8, 0.6], dtype=np.float32)
    tgt_lens = np.asarray([1.0, 0.8, 0.4], dtype=np.float32)

    def torch_loss(lg):
        lp = torch.log_softmax(lg, dim=-1)
        return ref_ctc(
            lp,
            torch.tensor(targets),
            torch.tensor(in_lens),
            torch.tensor(tgt_lens),
            blank_index=0,
            reduction=reduction,
        )

    t_loss, t_grad = _torch_grad(torch, torch_loss, logits)

    def jax_loss(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return L.ctc_loss(
            lp, targets, in_lens, tgt_lens, blank_index=0, reduction=reduction
        )

    o_loss, o_grad = jax.value_and_grad(jax_loss)(jnp.asarray(logits))
    assert_close(o_loss, t_loss, rtol=1e-4, atol=1e-5, what="ctc loss value")
    grads_close(o_grad, t_grad, what=f"ctc grad [{reduction}]")


def test_grad_nll_loss(ref, torch, loss_data):
    from speechbrain.nnet.losses import nll_loss as ref_nll
    import speechbrain_tpu.nnet.losses as L

    logits, targets, lengths = loss_data
    for smoothing in (0.0, 0.1):

        def torch_loss(lg):
            lp = torch.log_softmax(lg, dim=-1)
            return ref_nll(
                lp,
                torch.tensor(targets),
                torch.tensor(lengths),
                label_smoothing=smoothing,
            )

        t_loss, t_grad = _torch_grad(torch, torch_loss, logits)

        def jax_loss(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return L.nll_loss(lp, targets, lengths, label_smoothing=smoothing)

        o_loss, o_grad = jax.value_and_grad(jax_loss)(jnp.asarray(logits))
        assert_close(o_loss, t_loss, rtol=1e-4, atol=1e-5, what="nll value")
        grads_close(o_grad, t_grad, what=f"nll grad smoothing={smoothing}")


def test_grad_mse_l1_bce_kldiv(ref, torch, loss_data):
    from speechbrain.nnet.losses import (
        mse_loss as ref_mse,
        l1_loss as ref_l1,
        bce_loss as ref_bce,
        kldiv_loss as ref_kld,
    )
    import speechbrain_tpu.nnet.losses as L

    logits, targets, lengths = loss_data
    rng = np.random.default_rng(7)
    tgt = rng.standard_normal(logits.shape).astype(np.float32)

    for name, ref_fn, our_fn in (
        ("mse", ref_mse, L.mse_loss),
        ("l1", ref_l1, L.l1_loss),
    ):
        t_loss, t_grad = _torch_grad(
            torch,
            lambda p: ref_fn(p, torch.tensor(tgt), torch.tensor(lengths)),
            logits,
        )
        o_loss, o_grad = jax.value_and_grad(
            lambda p: our_fn(p, tgt, lengths)
        )(jnp.asarray(logits))
        assert_close(o_loss, t_loss, rtol=1e-4, atol=1e-5, what=name)
        grads_close(o_grad, t_grad, what=f"{name} grad")

    # bce on (B, T) logits
    blogits = logits[:, :, 0]
    btargets = (tgt[:, :, 0] > 0).astype(np.float32)
    t_loss, t_grad = _torch_grad(
        torch,
        lambda p: ref_bce(p, torch.tensor(btargets), torch.tensor(lengths)),
        blogits,
    )
    o_loss, o_grad = jax.value_and_grad(
        lambda p: L.bce_loss(p, btargets, lengths)
    )(jnp.asarray(blogits))
    assert_close(o_loss, t_loss, rtol=1e-4, atol=1e-5, what="bce")
    grads_close(o_grad, t_grad, what="bce grad")

    # kldiv (label-smoothed CE path) on real padded targets
    T = targets.shape[1]
    valid = np.arange(T)[None, :] < np.round(lengths * T)[:, None]
    ktargets = np.where(valid, np.maximum(targets, 1), 0)

    def torch_loss(lg):
        lp = torch.log_softmax(lg, dim=-1)
        return ref_kld(
            lp,
            torch.tensor(ktargets),
            torch.tensor(lengths),
            label_smoothing=0.1,
        )

    t_loss, t_grad = _torch_grad(torch, torch_loss, logits)

    def jax_loss(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return L.kldiv_loss(lp, ktargets, lengths, label_smoothing=0.1)

    o_loss, o_grad = jax.value_and_grad(jax_loss)(jnp.asarray(logits))
    assert_close(o_loss, t_loss, rtol=1e-4, atol=1e-5, what="kldiv")
    grads_close(o_grad, t_grad, what="kldiv grad")


def test_grad_si_snr_pit(ref, torch):
    from speechbrain.nnet.losses import (
        get_si_snr_with_pitwrapper as ref_sisnr,
    )
    import speechbrain_tpu.nnet.losses as L

    rng = np.random.default_rng(8)
    B, T, S = 3, 64, 2
    source = rng.standard_normal((B, T, S)).astype(np.float32)
    est = rng.standard_normal((B, T, S)).astype(np.float32)

    def torch_loss(e):
        return ref_sisnr(torch.tensor(source), e).mean()

    t_loss, t_grad = _torch_grad(torch, torch_loss, est, wrt=0)

    def jax_loss(e):
        return L.get_si_snr_with_pitwrapper(jnp.asarray(source), e).mean()

    o_loss, o_grad = jax.value_and_grad(jax_loss)(jnp.asarray(est))
    assert_close(o_loss, t_loss, rtol=1e-4, atol=1e-5, what="si-snr PIT")
    grads_close(o_grad, t_grad, what="si-snr PIT grad")


def test_grad_aam_softmax(ref, torch):
    from speechbrain.nnet.losses import (
        AngularMargin as RefAM,
        AdditiveAngularMargin as RefAAM,
        LogSoftmaxWrapper as RefWrap,
    )
    import speechbrain_tpu.nnet.losses as L

    rng = np.random.default_rng(9)
    B, C = 6, 10
    # cosine-similarity-like outputs in (-1, 1)
    cos = np.tanh(rng.standard_normal((B, 1, C))).astype(np.float32)
    targets = rng.integers(0, C, (B, 1)).astype(np.int64)

    for name, ref_cls, our_cls in (
        ("AM", RefAM, L.AngularMargin),
        ("AAM", RefAAM, L.AdditiveAngularMargin),
    ):
        t_wrap = RefWrap(ref_cls(margin=0.2, scale=30))

        def torch_loss(c):
            return t_wrap(c, torch.tensor(targets))

        t_loss, t_grad = _torch_grad(torch, torch_loss, cos)

        o_wrap = L.LogSoftmaxWrapper(our_cls(margin=0.2, scale=30))

        def jax_loss(c):
            return o_wrap(c, targets)

        o_loss, o_grad = jax.value_and_grad(jax_loss)(jnp.asarray(cos))
        assert_close(o_loss, t_loss, rtol=1e-4, atol=1e-5, what=name)
        grads_close(o_grad, t_grad, what=f"{name} grad")


# ---------------------------------------------------------------------------
# Transducer: pure-torch transcription of the reference Numba recurrence
# ---------------------------------------------------------------------------


def _ref_transducer_torch(torch, logits, labels, T, U, blank, normalize):
    """Line-faithful torch transcription of the reference CUDA kernel
    (``nnet/loss/transducer_loss.py:34-106``): log-space alpha lattice
    over (t, u), loss = -(alpha[T-1, U] + lp[T-1, U, blank]) (/T when
    ``normalize``, the kernel's own convention at :104-106)."""
    log_probs = torch.log_softmax(logits, dim=-1)
    B = logits.shape[0]
    losses = []
    for b in range(B):
        Tb, Ub = int(T[b]), int(U[b])
        lp = log_probs[b]
        alpha = [[None] * (Ub + 1) for _ in range(Tb)]
        alpha[0][0] = torch.zeros((), dtype=logits.dtype)
        for t in range(1, Tb):
            alpha[t][0] = alpha[t - 1][0] + lp[t - 1, 0, blank]
        for u in range(1, Ub + 1):
            alpha[0][u] = alpha[0][u - 1] + lp[0, u - 1, labels[b, u - 1]]
        for t in range(1, Tb):
            for u in range(1, Ub + 1):
                emit = alpha[t][u - 1] + lp[t, u - 1, labels[b, u - 1]]
                no_emit = alpha[t - 1][u] + lp[t - 1, u, blank]
                alpha[t][u] = torch.logaddexp(no_emit, emit)
        ll = alpha[Tb - 1][Ub] + lp[Tb - 1, Ub, blank]
        if normalize:
            ll = ll / Tb
        losses.append(-ll)
    return torch.stack(losses)


@pytest.mark.parametrize("normalize_by_T", [False, True])
def test_grad_transducer_loss(ref, torch, normalize_by_T):
    from speechbrain_tpu.nnet.loss.transducer_loss import TransducerLoss

    rng = np.random.default_rng(10)
    B, T, U, V = 3, 8, 5, 6
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, U)).astype(np.int32)
    t_lens = np.asarray([8, 6, 5], dtype=np.int32)
    u_lens = np.asarray([5, 3, 2], dtype=np.int32)

    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss_vec = _ref_transducer_torch(
        torch,
        t_logits,
        torch.tensor(labels.astype(np.int64)),
        t_lens,
        u_lens,
        blank=0,
        normalize=normalize_by_T,
    )
    t_loss = t_loss_vec.mean()
    t_loss.backward()

    tl = TransducerLoss(
        blank_index=0, normalize_by_T=normalize_by_T, use_pallas=False
    )

    def jax_loss(lg):
        return tl(lg, labels, t_lens, u_lens).mean()

    o_loss, o_grad = jax.value_and_grad(jax_loss)(jnp.asarray(logits))
    assert_close(
        o_loss, t_loss, rtol=1e-4, atol=1e-5,
        what=f"transducer loss norm={normalize_by_T}",
    )
    grads_close(
        o_grad, t_logits.grad,
        what=f"transducer grad norm={normalize_by_T}",
    )


# ---------------------------------------------------------------------------
# Tier 2: whole-model train steps (loss value + every parameter gradient)
# ---------------------------------------------------------------------------


def _map_torch_tree(get, mapping):
    """Apply a transplant mapping {our_flat_key: fn(get)} -> flat dict."""
    return {k: fn(get) for k, fn in mapping.items()}


def _compare_grad_trees(o_flat, t_flat, what, rtol=2e-3, atol=1e-4):
    """Compare per-leaf, plus overall cosine similarity of the update."""
    import flax

    assert set(t_flat) <= set(o_flat), set(t_flat) - set(o_flat)
    dots, n_o, n_t = 0.0, 0.0, 0.0
    for k, tv in t_flat.items():
        ov = np.asarray(o_flat[k], np.float64)
        tv = np.asarray(to_np(tv), np.float64)
        assert ov.shape == tv.shape, (k, ov.shape, tv.shape)
        np.testing.assert_allclose(
            ov, tv, rtol=rtol, atol=atol, err_msg=f"{what}: grad[{k}]"
        )
        dots += float((ov * tv).sum())
        n_o += float((ov * ov).sum())
        n_t += float((tv * tv).sum())
    cos = dots / np.sqrt(n_o * n_t)
    assert cos > 0.9999, f"{what}: update-direction cosine {cos}"


def test_grad_crdnn_ctc_train_step(ref, torch):
    """One CRDNN→Linear→CTC train step: loss + all parameter grads.

    Mirrors the reference TIMIT CTC recipe objective
    (``recipes/TIMIT/ASR/CTC``): features → CRDNN → linear head →
    log_softmax → ctc_loss, backward through LiGRU scan, batch-norm
    (train-mode batch statistics), and conv stacks on both sides.
    """
    from speechbrain.lobes.models.CRDNN import CRDNN as RefCRDNN
    from speechbrain.nnet.linear import Linear as RefLinear
    from speechbrain.nnet.losses import ctc_loss as ref_ctc
    from speechbrain_tpu.lobes.models.CRDNN import CRDNN as OursCRDNN
    from speechbrain_tpu.nnet.linear import Linear as OursLinear
    import speechbrain_tpu.nnet.losses as L
    import flax

    C_OUT = 8
    theirs_crdnn = RefCRDNN(
        input_size=20,
        cnn_blocks=1,
        cnn_channels=[4],
        rnn_layers=1,
        rnn_neurons=12,
        dnn_blocks=1,
        dnn_neurons=12,
        time_pooling=True,
        dropout=0.0,
    )
    theirs_head = RefLinear(input_size=12, n_neurons=C_OUT)
    theirs_crdnn.train()
    theirs_head.train()

    rng = np.random.default_rng(50)
    B, T, F = 2, 24, 20
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    targets = rng.integers(1, C_OUT, (B, 5)).astype(np.int64)
    in_lens = np.asarray([1.0, 0.75], dtype=np.float32)
    tgt_lens = np.asarray([1.0, 0.6], dtype=np.float32)

    x_t = torch.tensor(x)
    out = theirs_head(theirs_crdnn(x_t))
    lp = torch.log_softmax(out, dim=-1)
    t_loss = ref_ctc(
        lp,
        torch.tensor(targets),
        torch.tensor(in_lens),
        torch.tensor(tgt_lens),
        blank_index=0,
        reduction="mean",
    )
    t_loss.backward()

    ours_crdnn = OursCRDNN(
        cnn_blocks=1,
        cnn_channels=(4,),
        rnn_layers=1,
        rnn_neurons=12,
        dnn_blocks=1,
        dnn_neurons=12,
        time_pooling=True,
        dropout=0.0,
    )
    ours_head = OursLinear(n_neurons=C_OUT)
    init = ours_crdnn.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x),
        train=True,
    )
    head_init = ours_head.init(jax.random.PRNGKey(2), jnp.zeros((B, T, 12)))

    # transplant mapping: our flat key -> fn(get) over torch param names.
    # Used twice: once on .data (weights in), once on .grad (grads out).
    mapping = {
        "crdnn/cnn_0/Conv2d_0/Conv_0/kernel": lambda g: jnp.transpose(
            g("crdnn.CNN.block_0.conv_1.conv.weight"), (3, 2, 1, 0)
        ),
        "crdnn/cnn_0/Conv2d_0/Conv_0/bias": lambda g: g(
            "crdnn.CNN.block_0.conv_1.conv.bias"
        ),
        "crdnn/cnn_0/LayerNorm_0/LayerNorm_0/scale": lambda g: g(
            "crdnn.CNN.block_0.norm_1.norm.weight"
        ),
        "crdnn/cnn_0/LayerNorm_0/LayerNorm_0/bias": lambda g: g(
            "crdnn.CNN.block_0.norm_1.norm.bias"
        ),
        "crdnn/cnn_0/Conv2d_1/Conv_0/kernel": lambda g: jnp.transpose(
            g("crdnn.CNN.block_0.conv_2.conv.weight"), (3, 2, 1, 0)
        ),
        "crdnn/cnn_0/Conv2d_1/Conv_0/bias": lambda g: g(
            "crdnn.CNN.block_0.conv_2.conv.bias"
        ),
        "crdnn/cnn_0/LayerNorm_1/LayerNorm_0/scale": lambda g: g(
            "crdnn.CNN.block_0.norm_2.norm.weight"
        ),
        "crdnn/cnn_0/LayerNorm_1/LayerNorm_0/bias": lambda g: g(
            "crdnn.CNN.block_0.norm_2.norm.bias"
        ),
        "crdnn/rnn/l0_wx/kernel": lambda g: g("crdnn.RNN.rnn.0.w.weight").T,
        "crdnn/rnn/l0_u": lambda g: g("crdnn.RNN.rnn.0.u.weight").T,
        "crdnn/rnn/l0_bn/scale": lambda g: g("crdnn.RNN.rnn.0.norm.weight"),
        "crdnn/rnn/l0_bn/bias": lambda g: g("crdnn.RNN.rnn.0.norm.bias"),
        "crdnn/dnn_0/Dense_0/kernel": lambda g: g(
            "crdnn.DNN.block_0.linear.w.weight"
        ).T,
        "crdnn/dnn_0/Dense_0/bias": lambda g: g(
            "crdnn.DNN.block_0.linear.w.bias"
        ),
        "crdnn/dnn_0/BatchNorm1d_0/BatchNorm_0/scale": lambda g: g(
            "crdnn.DNN.block_0.norm.norm.weight"
        ),
        "crdnn/dnn_0/BatchNorm1d_0/BatchNorm_0/bias": lambda g: g(
            "crdnn.DNN.block_0.norm.norm.bias"
        ),
        "head/Dense_0/kernel": lambda g: g("head.w.weight").T,
        "head/Dense_0/bias": lambda g: g("head.w.bias"),
    }

    named = dict(theirs_crdnn.named_parameters(prefix="crdnn"))
    named.update(theirs_head.named_parameters(prefix="head"))
    get_w = lambda n: t2j(named[n].data)
    flat = flax.traverse_util.flatten_dict(init["params"], sep="/")
    flat = {f"crdnn/{k}": v for k, v in flat.items()}
    flat.update(
        {
            f"head/{k}": v
            for k, v in flax.traverse_util.flatten_dict(
                head_init["params"], sep="/"
            ).items()
        }
    )
    transplanted = _map_torch_tree(get_w, mapping)
    for k, v in transplanted.items():
        assert k in flat and flat[k].shape == v.shape, (
            k, flat.get(k, jnp.zeros(())).shape, v.shape,
        )
    flat.update(transplanted)
    assert set(flat) == set(
        list(mapping)
    ), f"untransplanted params: {set(flat) - set(mapping)}"

    stats = flax.traverse_util.flatten_dict(init["batch_stats"], sep="/")
    stats = {f"crdnn/{k}": v for k, v in stats.items()}

    def split_vars(flat_all):
        crdnn_p = flax.traverse_util.unflatten_dict(
            {
                k[len("crdnn/"):]: v
                for k, v in flat_all.items()
                if k.startswith("crdnn/")
            },
            sep="/",
        )
        head_p = flax.traverse_util.unflatten_dict(
            {
                k[len("head/"):]: v
                for k, v in flat_all.items()
                if k.startswith("head/")
            },
            sep="/",
        )
        return crdnn_p, head_p

    crdnn_stats = flax.traverse_util.unflatten_dict(
        {k[len("crdnn/"):]: v for k, v in stats.items()}, sep="/"
    )

    def loss_fn(flat_params):
        crdnn_p, head_p = split_vars(flat_params)
        feats, _ = ours_crdnn.apply(
            {"params": crdnn_p, "batch_stats": crdnn_stats},
            jnp.asarray(x),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        out = ours_head.apply({"params": head_p}, feats)
        lp = jax.nn.log_softmax(out, axis=-1)
        return L.ctc_loss(
            lp, targets, in_lens, tgt_lens, blank_index=0, reduction="mean"
        )

    o_loss, o_grads = jax.value_and_grad(loss_fn)(flat)
    assert_close(o_loss, t_loss, rtol=1e-3, atol=1e-4, what="CRDNN-CTC loss")

    get_g = lambda n: t2j(named[n].grad)
    t_grads = _map_torch_tree(get_g, mapping)
    _compare_grad_trees(o_grads, t_grads, "CRDNN-CTC", rtol=5e-3, atol=2e-4)


def test_grad_transformer_asr_joint_step(ref, torch):
    """TransformerASR joint CTC/attention train step: transplant
    weights, compute 0.3*ctc + 0.7*label-smoothed-kldiv (the reference
    LibriSpeech transformer objective, ``recipes/LibriSpeech/ASR/
    transformer/train.py``), compare loss + every parameter grad."""
    from speechbrain.lobes.models.transformer.TransformerASR import (
        TransformerASR as Ref,
    )
    from speechbrain.nnet.linear import Linear as RefLinear
    from speechbrain.nnet.losses import (
        ctc_loss as ref_ctc,
        kldiv_loss as ref_kld,
    )
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR as Ours,
    )
    from speechbrain_tpu.nnet.linear import Linear as OursLinear
    import speechbrain_tpu.nnet.losses as L
    import flax

    V, E = 20, 16
    cfg = dict(
        tgt_vocab=V,
        input_size=24,
        d_model=E,
        nhead=2,
        num_encoder_layers=1,
        num_decoder_layers=1,
        d_ffn=32,
        dropout=0.0,
        encoder_module="transformer",
        attention_type="regularMHA",
        positional_encoding="fixed_abs_sine",
    )
    theirs_mod = Ref(**cfg)
    theirs_ctc = RefLinear(input_size=E, n_neurons=V)
    theirs_seq = RefLinear(input_size=E, n_neurons=V)
    theirs_mod.train()

    rng = np.random.default_rng(90)
    B, Tsrc, U = 2, 12, 5
    src = rng.standard_normal((B, Tsrc, 24)).astype(np.float32)
    tokens = rng.integers(1, V, (B, U)).astype(np.int64)
    tokens[1, 4:] = 0  # trailing padding (reference masks tokens == 0)
    bos = np.full((B, 1), V - 1, np.int64)  # nonzero bos (pad idx is 0)
    tokens_bos = np.concatenate([bos, tokens[:, :-1]], axis=1)
    wav_len = np.asarray([1.0, 0.75], dtype=np.float32)
    tgt_len = np.asarray([1.0, 0.8], dtype=np.float32)

    enc, dec = theirs_mod(
        torch.tensor(src), torch.tensor(tokens_bos), torch.tensor(wav_len)
    )
    p_ctc = torch.log_softmax(theirs_ctc(enc), dim=-1)
    p_seq = torch.log_softmax(theirs_seq(dec), dim=-1)
    t_ctc = ref_ctc(
        p_ctc,
        torch.tensor(tokens),
        torch.tensor(wav_len),
        torch.tensor(tgt_len),
        blank_index=0,
        reduction="batchmean",
    )
    t_att = ref_kld(
        p_seq,
        torch.tensor(tokens),
        torch.tensor(tgt_len),
        label_smoothing=0.1,
        reduction="batchmean",
    )
    t_loss = 0.3 * t_ctc + 0.7 * t_att
    t_loss.backward()

    sd_named = dict(theirs_mod.named_parameters(prefix="m"))
    sd_named.update(theirs_ctc.named_parameters(prefix="ctc"))
    sd_named.update(theirs_seq.named_parameters(prefix="seq"))

    def build_mapping():
        def mha(prefix, ours_prefix, out):
            for i, qkv in enumerate(["q_proj", "k_proj", "v_proj"]):
                out[f"{ours_prefix}/{qkv}/kernel"] = (
                    lambda g, p=prefix, i=i: g(f"{p}.att.in_proj_weight")[
                        i * E : (i + 1) * E
                    ].T
                )
                out[f"{ours_prefix}/{qkv}/bias"] = (
                    lambda g, p=prefix, i=i: g(f"{p}.att.in_proj_bias")[
                        i * E : (i + 1) * E
                    ]
                )
            out[f"{ours_prefix}/out_proj/kernel"] = (
                lambda g, p=prefix: g(f"{p}.att.out_proj.weight").T
            )
            out[f"{ours_prefix}/out_proj/bias"] = (
                lambda g, p=prefix: g(f"{p}.att.out_proj.bias")
            )

        def ln(prefix, ours_prefix, out):
            out[f"{ours_prefix}/scale"] = (
                lambda g, p=prefix: g(f"{p}.norm.weight")
            )
            out[f"{ours_prefix}/bias"] = (
                lambda g, p=prefix: g(f"{p}.norm.bias")
            )

        def ffn(prefix, ours_prefix, out):
            for i, j in (("0", "0"), ("1", "3")):
                out[f"{ours_prefix}/Dense_{i}/kernel"] = (
                    lambda g, p=prefix, j=j: g(f"{p}.ffn.{j}.weight").T
                )
                out[f"{ours_prefix}/Dense_{i}/bias"] = (
                    lambda g, p=prefix, j=j: g(f"{p}.ffn.{j}.bias")
                )

        m = {}
        mha("m.encoder.layers.0.self_att",
            "asr/encoder/layer_0/MultiheadAttention_0", m)
        ffn("m.encoder.layers.0.pos_ffn",
            "asr/encoder/layer_0/PositionalwiseFeedForward_0", m)
        ln("m.encoder.layers.0.norm1", "asr/encoder/layer_0/LayerNorm_0", m)
        ln("m.encoder.layers.0.norm2", "asr/encoder/layer_0/LayerNorm_1", m)
        ln("m.encoder.norm", "asr/encoder/norm_out", m)
        mha("m.decoder.layers.0.self_attn", "asr/decoder/layer_0/self_attn", m)
        mha("m.decoder.layers.0.mutihead_attn",
            "asr/decoder/layer_0/cross_attn", m)
        ffn("m.decoder.layers.0.pos_ffn",
            "asr/decoder/layer_0/PositionalwiseFeedForward_0", m)
        ln("m.decoder.layers.0.norm1", "asr/decoder/layer_0/LayerNorm_0", m)
        ln("m.decoder.layers.0.norm2", "asr/decoder/layer_0/LayerNorm_1", m)
        ln("m.decoder.layers.0.norm3", "asr/decoder/layer_0/LayerNorm_2", m)
        ln("m.decoder.norm", "asr/decoder/norm_out", m)
        m["ctc_head/Dense_0/kernel"] = lambda g: g("ctc.w.weight").T
        m["ctc_head/Dense_0/bias"] = lambda g: g("ctc.w.bias")
        m["seq_head/Dense_0/kernel"] = lambda g: g("seq.w.weight").T
        m["seq_head/Dense_0/bias"] = lambda g: g("seq.w.bias")
        return m

    mapping = build_mapping()

    ours = Ours(**cfg)
    ours_ctc = OursLinear(n_neurons=V)
    ours_seq = OursLinear(n_neurons=V)
    init = ours.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(src),
        jnp.asarray(tokens_bos),
    )
    flat = {
        f"asr/{k}": v
        for k, v in flax.traverse_util.flatten_dict(
            init["params"], sep="/"
        ).items()
    }
    flat.update(
        {
            f"ctc_head/{k}": v
            for k, v in flax.traverse_util.flatten_dict(
                ours_ctc.init(jax.random.PRNGKey(2), jnp.zeros((1, 1, E)))[
                    "params"
                ],
                sep="/",
            ).items()
        }
    )
    flat.update(
        {
            f"seq_head/{k}": v
            for k, v in flax.traverse_util.flatten_dict(
                ours_seq.init(jax.random.PRNGKey(3), jnp.zeros((1, 1, E)))[
                    "params"
                ],
                sep="/",
            ).items()
        }
    )

    # src-proj + tgt embedding keys are model-structure dependent
    src_keys = [k for k in flat if k.startswith("asr/custom_src_module")]
    kkey = [k for k in src_keys if k.endswith("kernel")][0]
    bkey = [k for k in src_keys if k.endswith("bias")][0]
    mapping[kkey] = lambda g: g("m.custom_src_module.layers.0.w.weight").T
    mapping[bkey] = lambda g: g("m.custom_src_module.layers.0.w.bias")
    emb_key = [k for k in flat if k.startswith("asr/custom_tgt_module")][0]
    mapping[emb_key] = lambda g: g(
        "m.custom_tgt_module.layers.0.emb.Embedding.weight"
    )

    get_w = lambda n: t2j(sd_named[n].data)
    transplanted = _map_torch_tree(get_w, mapping)
    for k, v in transplanted.items():
        assert k in flat and flat[k].shape == v.shape, (
            k, flat.get(k, jnp.zeros(())).shape, v.shape,
        )
    flat.update(transplanted)
    assert set(flat) == set(mapping), set(flat) ^ set(mapping)

    def loss_fn(flat_params):
        def sub(prefix):
            return flax.traverse_util.unflatten_dict(
                {
                    k[len(prefix) + 1:]: v
                    for k, v in flat_params.items()
                    if k.startswith(prefix + "/")
                },
                sep="/",
            )

        enc_o, dec_o = ours.apply(
            {"params": sub("asr")},
            jnp.asarray(src),
            jnp.asarray(tokens_bos),
            wav_len=jnp.asarray(wav_len),
            train=True,
            rngs={"dropout": jax.random.PRNGKey(4)},
        )
        lp_ctc = jax.nn.log_softmax(
            ours_ctc.apply({"params": sub("ctc_head")}, enc_o), axis=-1
        )
        lp_seq = jax.nn.log_softmax(
            ours_seq.apply({"params": sub("seq_head")}, dec_o), axis=-1
        )
        l_ctc = L.ctc_loss(
            lp_ctc, tokens, wav_len, tgt_len, blank_index=0,
            reduction="batchmean",
        )
        l_att = L.kldiv_loss(
            lp_seq, tokens, tgt_len, label_smoothing=0.1,
            reduction="batchmean",
        )
        return 0.3 * l_ctc + 0.7 * l_att

    o_loss, o_grads = jax.value_and_grad(loss_fn)(flat)
    assert_close(
        o_loss, t_loss, rtol=1e-3, atol=1e-4, what="joint CTC/attn loss"
    )

    get_g = lambda n: t2j(sd_named[n].grad)
    t_grads = _map_torch_tree(get_g, mapping)
    _compare_grad_trees(
        o_grads, t_grads, "TransformerASR joint", rtol=5e-3, atol=2e-4
    )


def test_grad_conformer_layer(ref, torch):
    """Conformer encoder layer parameter gradients (RelPosMHAXL
    backward — the hot backward path named in PERFORMANCE.md)."""
    from speechbrain.lobes.models.transformer.Conformer import (
        ConformerEncoderLayer as Ref,
    )
    from speechbrain.nnet.attention import RelPosEncXL as RefPE
    from speechbrain_tpu.lobes.models.transformer.Conformer import (
        ConformerEncoderLayer as Ours,
    )
    from speechbrain_tpu.nnet.attention import RelPosEncXL
    import flax

    D, F, H, K = 16, 32, 2, 7
    theirs_mod = Ref(d_model=D, d_ffn=F, nhead=H, kernel_size=K, dropout=0.0)
    theirs_mod.train()
    rng = np.random.default_rng(77)
    x = rng.standard_normal((2, 10, D)).astype(np.float32)
    x_t = torch.tensor(x)
    pe_t = RefPE(emb_dim=D)(x_t)
    out, _ = theirs_mod(x_t, pos_embs=pe_t)
    t_loss = (out ** 2).mean()
    t_loss.backward()

    sd_named = dict(theirs_mod.named_parameters())
    d_head = D // H

    def build(get):
        def w_i(i):
            return get("mha_layer.in_proj_weight").reshape(
                H, 3, d_head, D
            )[:, i].reshape(D, D).T

        def ln(prefix):
            key = f"{prefix}.norm.weight"
            if key not in sd_named:
                key = f"{prefix}.weight"
            kb = key.replace("weight", "bias")
            return {"scale": get(key), "bias": get(kb)}

        return {
            "LayerNorm_0": ln("ffn_module1.0"),
            "LayerNorm_1": ln("norm1"),
            "LayerNorm_2": ln("ffn_module2.0"),
            "LayerNorm_3": ln("norm2"),
            "mha": {
                "q_proj": {"kernel": w_i(0)},
                "k_proj": {"kernel": w_i(1)},
                "v_proj": {"kernel": w_i(2)},
                "out_proj": {
                    "kernel": get("mha_layer.out_proj.weight").T,
                    "bias": get("mha_layer.out_proj.bias"),
                },
                "pos_proj": {"kernel": get("mha_layer.linear_pos.weight").T},
                "pos_bias_u": get("mha_layer.pos_bias_u").reshape(H, d_head),
                "pos_bias_v": get("mha_layer.pos_bias_v").reshape(H, d_head),
            },
            "conv": {
                "LayerNorm_0": ln("convolution_module.layer_norm"),
                "Dense_0": {
                    "kernel": get(
                        "convolution_module.bottleneck.0.weight"
                    )[:, :, 0].T,
                    "bias": get("convolution_module.bottleneck.0.bias"),
                },
                "depthwise_kernel": get(
                    "convolution_module.conv.weight"
                )[:, 0, :].T,
                "depthwise_bias": get("convolution_module.conv.bias"),
                "LayerNorm_1": ln("convolution_module.after_conv.0"),
                "Dense_1": {
                    "kernel": get("convolution_module.after_conv.2.weight").T,
                    "bias": get("convolution_module.after_conv.2.bias"),
                },
            },
            "ffn1": {
                "Dense_0": {
                    "kernel": get("ffn_module1.1.ffn.0.weight").T,
                    "bias": get("ffn_module1.1.ffn.0.bias"),
                },
                "Dense_1": {
                    "kernel": get("ffn_module1.1.ffn.3.weight").T,
                    "bias": get("ffn_module1.1.ffn.3.bias"),
                },
            },
            "ffn2": {
                "Dense_0": {
                    "kernel": get("ffn_module2.1.ffn.0.weight").T,
                    "bias": get("ffn_module2.1.ffn.0.bias"),
                },
                "Dense_1": {
                    "kernel": get("ffn_module2.1.ffn.3.weight").T,
                    "bias": get("ffn_module2.1.ffn.3.bias"),
                },
            },
        }

    params = build(lambda n: t2j(sd_named[n].data))
    ours = Ours(d_model=D, d_ffn=F, nhead=H, kernel_size=K, dropout=0.0)
    pe = RelPosEncXL(emb_dim=D)(jnp.asarray(x))

    def loss_fn(p):
        y, _ = ours.apply(
            {"params": p}, jnp.asarray(x), pos_embs=pe, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return (y ** 2).mean()

    o_loss, o_grads = jax.value_and_grad(loss_fn)(params)
    assert_close(
        o_loss, t_loss, rtol=1e-3, atol=1e-5, what="conformer layer loss"
    )
    t_grads = build(lambda n: t2j(sd_named[n].grad))
    import flax as _f

    o_flat = _f.traverse_util.flatten_dict(o_grads, sep="/")
    t_flat = _f.traverse_util.flatten_dict(t_grads, sep="/")
    _compare_grad_trees(
        o_flat, t_flat, "ConformerEncoderLayer", rtol=5e-3, atol=2e-4
    )


def make_conformer_transplant(E, H, num_encoder_layers):
    """Factory for the torch->flax conformer ASR weight/grad
    transplant: returns ``build(get)`` mapping a torch name->tensor
    getter to our flax param tree (shared by the single-step grad
    parity test and the K-step trajectory test)."""
    d_head = E // H

    def build(get):
        out = {}

        def conformer_layer(i):
            p = f"m.encoder.layers.{i}"

            def w_i(j):
                return get(f"{p}.mha_layer.in_proj_weight").reshape(
                    H, 3, d_head, E
                )[:, j].reshape(E, E).T

            def ln(prefix, has_norm=True):
                key = f"{prefix}.norm.weight" if has_norm else f"{prefix}.weight"
                kb = key.replace("weight", "bias")
                return {"scale": get(key), "bias": get(kb)}

            return {
                "LayerNorm_0": ln(f"{p}.ffn_module1.0", has_norm=False),
                "LayerNorm_1": ln(f"{p}.norm1"),
                "LayerNorm_2": ln(f"{p}.ffn_module2.0", has_norm=False),
                "LayerNorm_3": ln(f"{p}.norm2"),
                "mha": {
                    "q_proj": {"kernel": w_i(0)},
                    "k_proj": {"kernel": w_i(1)},
                    "v_proj": {"kernel": w_i(2)},
                    "out_proj": {
                        "kernel": get(f"{p}.mha_layer.out_proj.weight").T,
                        "bias": get(f"{p}.mha_layer.out_proj.bias"),
                    },
                    "pos_proj": {
                        "kernel": get(f"{p}.mha_layer.linear_pos.weight").T
                    },
                    "pos_bias_u": get(f"{p}.mha_layer.pos_bias_u").reshape(
                        H, d_head
                    ),
                    "pos_bias_v": get(f"{p}.mha_layer.pos_bias_v").reshape(
                        H, d_head
                    ),
                },
                "conv": {
                    "LayerNorm_0": ln(f"{p}.convolution_module.layer_norm",
                                      has_norm=False),
                    "Dense_0": {
                        "kernel": get(
                            f"{p}.convolution_module.bottleneck.0.weight"
                        )[:, :, 0].T,
                        "bias": get(
                            f"{p}.convolution_module.bottleneck.0.bias"
                        ),
                    },
                    "depthwise_kernel": get(
                        f"{p}.convolution_module.conv.weight"
                    )[:, 0, :].T,
                    "depthwise_bias": get(
                        f"{p}.convolution_module.conv.bias"
                    ),
                    "LayerNorm_1": ln(f"{p}.convolution_module.after_conv.0",
                                      has_norm=False),
                    "Dense_1": {
                        "kernel": get(
                            f"{p}.convolution_module.after_conv.2.weight"
                        ).T,
                        "bias": get(
                            f"{p}.convolution_module.after_conv.2.bias"
                        ),
                    },
                },
                "ffn1": {
                    "Dense_0": {
                        "kernel": get(f"{p}.ffn_module1.1.ffn.0.weight").T,
                        "bias": get(f"{p}.ffn_module1.1.ffn.0.bias"),
                    },
                    "Dense_1": {
                        "kernel": get(f"{p}.ffn_module1.1.ffn.3.weight").T,
                        "bias": get(f"{p}.ffn_module1.1.ffn.3.bias"),
                    },
                },
                "ffn2": {
                    "Dense_0": {
                        "kernel": get(f"{p}.ffn_module2.1.ffn.0.weight").T,
                        "bias": get(f"{p}.ffn_module2.1.ffn.0.bias"),
                    },
                    "Dense_1": {
                        "kernel": get(f"{p}.ffn_module2.1.ffn.3.weight").T,
                        "bias": get(f"{p}.ffn_module2.1.ffn.3.bias"),
                    },
                },
            }

        def mha(prefix):
            w = get(f"{prefix}.att.in_proj_weight")
            b = get(f"{prefix}.att.in_proj_bias")
            return {
                "q_proj": {"kernel": w[:E].T, "bias": b[:E]},
                "k_proj": {"kernel": w[E:2 * E].T, "bias": b[E:2 * E]},
                "v_proj": {"kernel": w[2 * E:].T, "bias": b[2 * E:]},
                "out_proj": {
                    "kernel": get(f"{prefix}.att.out_proj.weight").T,
                    "bias": get(f"{prefix}.att.out_proj.bias"),
                },
            }

        def ln(prefix):
            return {
                "scale": get(f"{prefix}.norm.weight"),
                "bias": get(f"{prefix}.norm.bias"),
            }

        def ffn(prefix):
            return {
                "Dense_0": {
                    "kernel": get(f"{prefix}.ffn.0.weight").T,
                    "bias": get(f"{prefix}.ffn.0.bias"),
                },
                "Dense_1": {
                    "kernel": get(f"{prefix}.ffn.3.weight").T,
                    "bias": get(f"{prefix}.ffn.3.bias"),
                },
            }

        out["asr"] = {
            "encoder": {
                **{
                    f"layer_{i}": conformer_layer(i)
                    for i in range(num_encoder_layers)
                },
                "norm_out": ln("m.encoder.norm"),
            },
            "decoder": {
                "layer_0": {
                    "self_attn": mha("m.decoder.layers.0.self_attn"),
                    "cross_attn": mha("m.decoder.layers.0.mutihead_attn"),
                    "PositionalwiseFeedForward_0": ffn(
                        "m.decoder.layers.0.pos_ffn"
                    ),
                    "LayerNorm_0": ln("m.decoder.layers.0.norm1"),
                    "LayerNorm_1": ln("m.decoder.layers.0.norm2"),
                    "LayerNorm_2": ln("m.decoder.layers.0.norm3"),
                },
                "norm_out": ln("m.decoder.norm"),
            },
        }
        out["ctc_head"] = {
            "Dense_0": {
                "kernel": get("ctc.w.weight").T,
                "bias": get("ctc.w.bias"),
            }
        }
        out["seq_head"] = {
            "Dense_0": {
                "kernel": get("seq.w.weight").T,
                "bias": get("seq.w.bias"),
            }
        }
        return out

    return build


def test_grad_conformer_asr_joint_step(ref, torch):
    """FULL conformer TransformerASR joint CTC/attention train step:
    transplanted weights, 0.3*CTC + 0.7*label-smoothed-KL objective,
    loss value + every parameter gradient (the complete RelPosMHAXL +
    macaron + depthwise-conv backward of the flagship recipe)."""
    from speechbrain.lobes.models.transformer.TransformerASR import (
        TransformerASR as Ref,
    )
    from speechbrain.nnet.linear import Linear as RefLinear
    from speechbrain.nnet.losses import (
        ctc_loss as ref_ctc,
        kldiv_loss as ref_kld,
    )
    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR as Ours,
    )
    from speechbrain_tpu.nnet.linear import Linear as OursLinear
    import speechbrain_tpu.nnet.losses as L
    import flax

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
        # the reference CLASS defaults to a causal conformer conv; the
        # recipes (and our class default) use non-causal — pin it
        causal=False,
    )
    theirs_mod = Ref(**cfg)
    theirs_ctc = RefLinear(input_size=E, n_neurons=V)
    theirs_seq = RefLinear(input_size=E, n_neurons=V)
    theirs_mod.train()

    rng = np.random.default_rng(91)
    B, Tsrc, U = 2, 12, 5
    src = rng.standard_normal((B, Tsrc, 24)).astype(np.float32)
    tokens = rng.integers(1, V, (B, U)).astype(np.int64)
    tokens[1, 4:] = 0
    bos = np.full((B, 1), V - 1, np.int64)
    tokens_bos = np.concatenate([bos, tokens[:, :-1]], axis=1)
    wav_len = np.asarray([1.0, 0.75], dtype=np.float32)
    tgt_len = np.asarray([1.0, 0.8], dtype=np.float32)

    enc, dec = theirs_mod(
        torch.tensor(src), torch.tensor(tokens_bos), torch.tensor(wav_len)
    )
    p_ctc = torch.log_softmax(theirs_ctc(enc), dim=-1)
    p_seq = torch.log_softmax(theirs_seq(dec), dim=-1)
    t_loss = 0.3 * ref_ctc(
        p_ctc, torch.tensor(tokens), torch.tensor(wav_len),
        torch.tensor(tgt_len), blank_index=0, reduction="batchmean",
    ) + 0.7 * ref_kld(
        p_seq, torch.tensor(tokens), torch.tensor(tgt_len),
        label_smoothing=0.1, reduction="batchmean",
    )
    t_loss.backward()

    named = dict(theirs_mod.named_parameters(prefix="m"))
    named.update(theirs_ctc.named_parameters(prefix="ctc"))
    named.update(theirs_seq.named_parameters(prefix="seq"))
    build = make_conformer_transplant(E, H, num_encoder_layers=2)

