"""Loss-function numeric parity vs reference nnet/losses.py.

Same inputs through both; the reference masked-loss convention (every
loss takes relative lengths, `nnet/losses.py:297-690`) is the oracle.
"""

import numpy as np
import pytest

from tests.parity.conftest import assert_close

import speechbrain_tpu.nnet.losses as L


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    B, T, C = 4, 12, 7
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    targets = rng.integers(0, C, (B, T)).astype(np.int64)
    lengths = np.asarray([1.0, 0.75, 0.5, 1.0], dtype=np.float32)
    return logits, targets, lengths


def _log_softmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_nll_loss_parity(ref, torch, data):
    from speechbrain.nnet.losses import nll_loss as ref_nll

    logits, targets, lengths = data
    logp = _log_softmax(logits)
    theirs = ref_nll(
        torch.tensor(logp), torch.tensor(targets), torch.tensor(lengths)
    )
    ours = L.nll_loss(logp, targets, lengths)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="nll_loss")


def test_nll_loss_label_smoothing_parity(ref, torch, data):
    from speechbrain.nnet.losses import nll_loss as ref_nll

    logits, targets, lengths = data
    logp = _log_softmax(logits)
    theirs = ref_nll(
        torch.tensor(logp),
        torch.tensor(targets),
        torch.tensor(lengths),
        label_smoothing=0.1,
    )
    ours = L.nll_loss(logp, targets, lengths, label_smoothing=0.1)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="nll smoothing")


def test_mse_l1_parity(ref, torch, data):
    from speechbrain.nnet.losses import mse_loss as ref_mse, l1_loss as ref_l1

    logits, _, lengths = data
    rng = np.random.default_rng(2)
    tgt = rng.standard_normal(logits.shape).astype(np.float32)
    theirs = ref_mse(torch.tensor(logits), torch.tensor(tgt), torch.tensor(lengths))
    ours = L.mse_loss(logits, tgt, lengths)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="mse")
    theirs = ref_l1(torch.tensor(logits), torch.tensor(tgt), torch.tensor(lengths))
    ours = L.l1_loss(logits, tgt, lengths)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="l1")


def test_bce_parity(ref, torch):
    from speechbrain.nnet.losses import bce_loss as ref_bce

    rng = np.random.default_rng(3)
    B, T = 3, 9
    logits = rng.standard_normal((B, T)).astype(np.float32)
    targets = rng.integers(0, 2, (B, T)).astype(np.float32)
    lengths = np.asarray([1.0, 0.6, 0.9], dtype=np.float32)
    theirs = ref_bce(
        torch.tensor(logits), torch.tensor(targets), torch.tensor(lengths)
    )
    ours = L.bce_loss(logits, targets, lengths)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="bce")


def test_kldiv_parity(ref, torch, data):
    from speechbrain.nnet.losses import kldiv_loss as ref_kld

    logits, targets, lengths = data
    logp = _log_softmax(logits)
    # realistic padded targets: pad_idx (0) beyond each length, as the
    # data pipeline produces (the reference masks by pad_idx, we also
    # honor `length` — identical when padding is real)
    T = targets.shape[1]
    valid = np.arange(T)[None, :] < np.round(lengths * T)[:, None]
    targets = np.where(valid, np.maximum(targets, 1), 0)
    for reduction in ("mean", "batchmean", "sum"):
        theirs = ref_kld(
            torch.tensor(logp),
            torch.tensor(targets),
            torch.tensor(lengths),
            label_smoothing=0.1,
            reduction=reduction,
        )
        ours = L.kldiv_loss(
            logp, targets, lengths, label_smoothing=0.1, reduction=reduction
        )
        assert_close(
            ours, theirs, rtol=1e-4, atol=1e-5, what=f"kldiv {reduction}"
        )


def test_classification_error_parity(ref, torch, data):
    from speechbrain.nnet.losses import classification_error as ref_ce

    logits, targets, lengths = data
    theirs = ref_ce(
        torch.tensor(logits), torch.tensor(targets), torch.tensor(lengths)
    )
    ours = L.classification_error(logits, targets, lengths)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="cls error")


def test_ctc_loss_parity(ref, torch):
    """Our CTC loss vs torch's builtin (the reference wraps it,
    nnet/losses.py:245)."""
    from speechbrain.nnet.losses import ctc_loss as ref_ctc

    rng = np.random.default_rng(5)
    B, T, C, U = 3, 20, 8, 6
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    logp = _log_softmax(logits)
    targets = rng.integers(1, C, (B, U)).astype(np.int64)
    in_lens = np.asarray([1.0, 0.9, 0.8], dtype=np.float32)
    tgt_lens = np.asarray([1.0, 0.8, 0.5], dtype=np.float32)
    blank = 0
    theirs = ref_ctc(
        torch.tensor(logp),
        torch.tensor(targets),
        torch.tensor(in_lens),
        torch.tensor(tgt_lens),
        blank_index=blank,
    )
    ours = L.ctc_loss(logp, targets, in_lens, tgt_lens, blank_index=blank)
    assert_close(ours, theirs, rtol=1e-3, atol=1e-4, what="ctc")


def test_si_snr_pit_parity(ref, torch):
    from speechbrain.nnet.losses import (
        cal_si_snr as ref_sisnr,
        get_si_snr_with_pitwrapper as ref_pit,
    )

    rng = np.random.default_rng(6)
    T, B, S = 400, 2, 2
    src = rng.standard_normal((T, B, S)).astype(np.float32)
    est = (src + 0.3 * rng.standard_normal((T, B, S))).astype(np.float32)
    theirs = ref_sisnr(torch.tensor(src), torch.tensor(est))
    ours = L.cal_si_snr(src, est)
    assert_close(ours, theirs, rtol=1e-3, atol=1e-3, what="si-snr")

    # PIT wrapper input convention: (B, T, S)
    src_b = np.transpose(src, (1, 0, 2))
    est_b = np.transpose(est, (1, 0, 2))
    theirs = ref_pit(torch.tensor(src_b), torch.tensor(est_b))
    ours = L.get_si_snr_with_pitwrapper(src_b, est_b)
    assert_close(ours, theirs, rtol=1e-3, atol=1e-3, what="si-snr pit")


def test_si_snr_loss_masked_parity(ref, torch):
    from speechbrain.nnet.loss.si_snr_loss import si_snr_loss as ref_loss
    from speechbrain_tpu.nnet.loss.si_snr_loss import si_snr_loss

    rng = np.random.default_rng(16)
    B, T = 3, 300
    clean = rng.standard_normal((B, T)).astype(np.float32)
    noisy = (clean + 0.2 * rng.standard_normal((B, T))).astype(np.float32)
    lens = np.asarray([1.0, 0.7, 0.45], dtype=np.float32)
    theirs = ref_loss(torch.tensor(noisy), torch.tensor(clean), torch.tensor(lens))
    ours = si_snr_loss(noisy, clean, lens)
    assert_close(ours, theirs, rtol=1e-3, atol=1e-3, what="si_snr_loss")


def test_angular_margin_parity(ref, torch):
    from speechbrain.nnet.losses import (
        AngularMargin as RefAM,
        AdditiveAngularMargin as RefAAM,
    )

    rng = np.random.default_rng(7)
    B, C = 6, 10
    cos = np.clip(rng.standard_normal((B, C)).astype(np.float32), -1, 1)
    onehot = np.eye(C, dtype=np.float32)[rng.integers(0, C, B)]
    theirs = RefAM(margin=0.2, scale=30.0)(torch.tensor(cos), torch.tensor(onehot))
    ours = L.AngularMargin(margin=0.2, scale=30.0)(cos, onehot)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="AM")

    theirs = RefAAM(margin=0.2, scale=30.0)(torch.tensor(cos), torch.tensor(onehot))
    ours = L.AdditiveAngularMargin(margin=0.2, scale=30.0)(cos, onehot)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-4, what="AAM")


def test_pit_wrapper_permutation_parity(ref, torch):
    """PitWrapper must pick the same permutation + loss as reference."""
    from speechbrain.nnet.losses import PitWrapper as RefPit

    def ref_base(pred, tgt):
        return (pred - tgt) ** 2

    def our_base(pred, tgt):
        return (pred - tgt) ** 2

    rng = np.random.default_rng(8)
    B, T, S = 3, 50, 3
    tgt = rng.standard_normal((B, T, S)).astype(np.float32)
    perm = [2, 0, 1]
    pred = tgt[..., perm] + 0.01 * rng.standard_normal((B, T, S)).astype(
        np.float32
    )
    theirs_loss, theirs_perm = RefPit(ref_base)(
        torch.tensor(pred), torch.tensor(tgt)
    )
    ours_loss, ours_perm = L.PitWrapper(our_base)(pred, tgt)
    assert_close(ours_loss, theirs_loss, rtol=1e-4, atol=1e-5, what="pit loss")
    assert [list(p) for p in np.asarray(ours_perm)] == [
        list(p) for p in theirs_perm
    ]

    # reorder_tensor must agree too
    theirs_re = RefPit(ref_base).reorder_tensor(
        torch.tensor(pred), theirs_perm
    )
    ours_re = L.PitWrapper(our_base).reorder_tensor(pred, ours_perm)
    assert_close(ours_re, theirs_re, rtol=1e-6, atol=1e-7, what="pit reorder")


def test_guided_attention_loss_parity(ref, torch):
    from speechbrain.nnet.loss.guidedattn_loss import (
        GuidedAttentionLoss as RefGAL,
    )
    from speechbrain_tpu.nnet.loss.guidedattn_loss import GuidedAttentionLoss

    rng = np.random.default_rng(9)
    B, Tout, Tin = 2, 20, 12
    att = rng.random((B, Tout, Tin)).astype(np.float32)
    att = att / att.sum(-1, keepdims=True)
    in_lens = np.asarray([12, 9])
    out_lens = np.asarray([20, 15])
    theirs = RefGAL(sigma=0.2)(
        torch.tensor(att), torch.tensor(in_lens), torch.tensor(out_lens)
    )
    ours = GuidedAttentionLoss(sigma=0.2)(att, in_lens, out_lens)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="guided attn")
