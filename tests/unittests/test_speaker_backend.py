import numpy as np
import pytest

from speechbrain_tpu.processing.PLDA_LDA import (
    LDA,
    Ndx,
    PLDA,
    StatObject_SB,
    fast_PLDA_scoring,
)
from speechbrain_tpu.processing.diarization import (
    Spec_Clust_unorm,
    distribute_overlap,
    merge_ssegs_same_speaker,
)
from speechbrain_tpu.utils.metric_stats import EER, minDCF


def _speaker_data(n_spk=4, n_per=10, dim=16, sep=4.0, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_spk, dim)) * sep
    vecs, spk = [], []
    for s in range(n_spk):
        vecs.append(centers[s] + rng.normal(size=(n_per, dim)))
        spk += [f"spk{s}"] * n_per
    return np.concatenate(vecs), np.asarray(spk)


def test_plda_scoring_separates_speakers():
    vecs, spk = _speaker_data()
    segs = np.asarray([f"seg{i}" for i in range(len(spk))])
    stats = StatObject_SB(
        modelset=spk, segset=segs,
        stat0=np.ones((len(spk), 1)), stat1=vecs,
    )
    plda = PLDA(rank_f=8, nb_iter=5)
    plda.plda(stats)
    # Interleave so every speaker appears on both sides of the trials.
    enroll_idx = np.arange(0, len(spk), 2)
    test_idx = np.arange(1, len(spk), 2)
    enroll = StatObject_SB(
        modelset=segs[enroll_idx], segset=segs[enroll_idx],
        stat0=np.ones((len(enroll_idx), 1)), stat1=vecs[enroll_idx],
    )
    test = StatObject_SB(
        modelset=segs[test_idx], segset=segs[test_idx],
        stat0=np.ones((len(test_idx), 1)), stat1=vecs[test_idx],
    )
    models, testsegs, labels = [], [], []
    for i in enroll_idx:
        for j in test_idx:
            models.append(segs[i])
            testsegs.append(segs[j])
            labels.append(int(spk[i] == spk[j]))
    ndx = Ndx(models=models, testsegs=testsegs)
    scores = fast_PLDA_scoring(
        enroll, test, ndx, plda.mean, plda.F, plda.Sigma
    )
    # Collect scores aligned with labels
    pos, neg = [], []
    for m, t, lab in zip(models, testsegs, labels):
        mi = np.where(ndx.modelset == m)[0][0]
        si = np.where(ndx.segset == t)[0][0]
        (pos if lab else neg).append(scores.scoremat[mi, si])
    eer, _ = EER(np.asarray(pos), np.asarray(neg))
    assert eer < 0.15


def test_lda_improves_separation():
    vecs, spk = _speaker_data(sep=2.0)
    segs = np.asarray([f"seg{i}" for i in range(len(spk))])
    stats = StatObject_SB(
        modelset=spk, segset=segs,
        stat0=np.ones((len(spk), 1)), stat1=vecs,
    )
    lda = LDA()
    reduced = lda.do_lda(stats, reduced_dim=3)
    assert reduced.stat1.shape == (len(spk), 3)


def test_spectral_clustering_separates():
    vecs, spk = _speaker_data(n_spk=3, n_per=8, sep=6.0)
    clust = Spec_Clust_unorm()
    clust.do_spec_clust(vecs, k_oracle=3, p_val=0.5)
    labels = clust.labels_
    # Purity: majority label per cluster
    correct = 0
    for c in np.unique(labels):
        members = spk[labels == c]
        values, counts = np.unique(members, return_counts=True)
        correct += counts.max()
    assert correct / len(spk) > 0.9


def test_merge_and_overlap():
    lol = [
        ["r1", 0.0, 1.0, "s1"],
        ["r1", 1.0, 2.0, "s1"],
        ["r1", 2.0, 3.0, "s2"],
    ]
    merged = merge_ssegs_same_speaker(lol, "r1")
    assert len(merged) == 2
    assert merged[0][2] == 2.0
    overlapping = [["r1", 0.0, 2.0, "s1"], ["r1", 1.0, 3.0, "s2"]]
    fixed = distribute_overlap(overlapping)
    assert fixed[0][2] == fixed[1][1]


def test_eer_mindcf_sanity():
    rng = np.random.default_rng(0)
    pos = rng.normal(2.0, 1.0, 200)
    neg = rng.normal(-2.0, 1.0, 200)
    eer, th = EER(pos, neg)
    assert eer < 0.05
    dcf, _ = minDCF(pos, neg)
    assert dcf < 0.5
