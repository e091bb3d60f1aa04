"""Metric parity: EER, minDCF, WER stats, accuracy, binary metrics."""

import numpy as np
import pytest

from tests.parity.conftest import to_np


@pytest.fixture(scope="module")
def scores(torch):
    rng = np.random.default_rng(111)
    pos = (rng.standard_normal(200) * 0.8 + 1.0).astype(np.float32)
    neg = (rng.standard_normal(400) * 0.8 - 0.5).astype(np.float32)
    return pos, neg


def test_eer_parity(ref, torch, scores):
    from speechbrain.utils.metric_stats import EER as ref_EER
    from speechbrain_tpu.utils.metric_stats import EER

    pos, neg = scores
    t_eer, t_thr = ref_EER(torch.tensor(pos), torch.tensor(neg))
    o_eer, o_thr = EER(pos, neg)
    assert abs(float(t_eer) - float(o_eer)) < 1e-6, (t_eer, o_eer)
    assert abs(float(t_thr) - float(o_thr)) < 1e-5, (t_thr, o_thr)


def test_min_dcf_parity(ref, torch, scores):
    from speechbrain.utils.metric_stats import minDCF as ref_minDCF
    from speechbrain_tpu.utils.metric_stats import minDCF

    pos, neg = scores
    t_dcf, t_thr = ref_minDCF(torch.tensor(pos), torch.tensor(neg))
    o_dcf, o_thr = minDCF(pos, neg)
    assert abs(float(t_dcf) - float(o_dcf)) < 1e-6, (t_dcf, o_dcf)
    assert abs(float(t_thr) - float(o_thr)) < 1e-5, (t_thr, o_thr)


def test_error_rate_stats_parity(ref, torch):
    from speechbrain.utils.metric_stats import ErrorRateStats as RefStats
    from speechbrain_tpu.utils.metric_stats import ErrorRateStats

    ids = ["u1", "u2"]
    preds = [["the", "cat", "sit"], ["on", "mat"]]
    targets = [["the", "cat", "sat"], ["on", "the", "mat"]]
    theirs = RefStats()
    theirs.append(ids, preds, targets)
    t = theirs.summarize()
    ours = ErrorRateStats()
    ours.append(ids, preds, targets)
    o = ours.summarize()
    for key in ("WER", "SER", "num_edits", "insertions", "deletions",
                "substitutions"):
        assert o[key] == t[key], (key, o[key], t[key])


def test_accuracy_parity(ref, torch):
    from speechbrain.utils.Accuracy import AccuracyStats as RefAcc
    from speechbrain_tpu.utils.Accuracy import AccuracyStats

    rng = np.random.default_rng(112)
    B, T, C = 3, 8, 5
    logp = np.log(
        rng.dirichlet(np.ones(C), size=(B, T)).astype(np.float32)
    )
    targets = rng.integers(0, C, (B, T)).astype(np.int64)
    lengths = np.asarray([1.0, 0.75, 0.5], dtype=np.float32)
    theirs = RefAcc()
    theirs.append(
        torch.tensor(logp), torch.tensor(targets), torch.tensor(lengths)
    )
    ours = AccuracyStats()
    ours.append(logp, targets, lengths)
    assert abs(theirs.summarize() - ours.summarize()) < 1e-9
    assert theirs.correct == ours.correct and theirs.total == ours.total


def test_binary_metrics_parity(ref, torch):
    from speechbrain.utils.metric_stats import (
        BinaryMetricStats as RefStats,
    )
    from speechbrain_tpu.utils.metric_stats import BinaryMetricStats

    rng = np.random.default_rng(113)
    scores = rng.standard_normal(50).astype(np.float32)
    labels = (rng.random(50) > 0.5).astype(np.float32)
    ids = [f"u{i}" for i in range(50)]
    theirs = RefStats()
    theirs.append(ids, torch.tensor(scores), torch.tensor(labels))
    t = theirs.summarize(threshold=0.0)
    ours = BinaryMetricStats()
    ours.append(ids, scores, labels)
    o = ours.summarize(threshold=0.0)
    for key in ("TP", "TN", "FP", "FN", "precision", "recall", "F-score"):
        assert abs(float(o[key]) - float(t[key])) < 1e-6, (key, o[key], t[key])


def test_hmm_aligner_parity(ref, torch):
    """Forward log-likelihood and Viterbi alignment vs the reference
    HMMAligner (states_per_phoneme=1, forced left-to-right traversal)."""
    from speechbrain.alignment.aligner import HMMAligner as RefAligner
    from speechbrain_tpu.alignment.aligner import HMMAligner

    rng = np.random.default_rng(114)
    B, T, V, U = 2, 12, 6, 4
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    x = logits - logits.max(-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    phns = np.asarray([[1, 2, 3, 4], [2, 4, 1, 0]], dtype=np.int64)
    lens = np.asarray([1.0, 0.75], dtype=np.float32)
    phn_lens = np.asarray([1.0, 0.75], dtype=np.float32)

    ref_al = RefAligner()
    with torch.no_grad():
        t_fwd = ref_al(
            torch.tensor(logp), torch.tensor(lens),
            torch.tensor(phns), torch.tensor(phn_lens), "forward",
        )
        t_vit, t_align = ref_al(
            torch.tensor(logp), torch.tensor(lens),
            torch.tensor(phns), torch.tensor(phn_lens), "viterbi",
        )

    ours = HMMAligner()
    o_fwd = ours(logp, lens, phns, phn_lens, dp="forward")
    o_vit, o_align = ours(logp, lens, phns, phn_lens, dp="viterbi")
    np.testing.assert_allclose(
        np.asarray(o_fwd), np.asarray(t_fwd), rtol=1e-4, atol=1e-4,
        err_msg="aligner forward",
    )
    np.testing.assert_allclose(
        np.asarray(o_vit), np.asarray(t_vit), rtol=1e-4, atol=1e-4,
        err_msg="aligner viterbi ll",
    )
    t_align = [list(map(int, a)) for a in t_align]
    o_align = [list(map(int, a)) for a in o_align]
    assert o_align == t_align, (o_align, t_align)
