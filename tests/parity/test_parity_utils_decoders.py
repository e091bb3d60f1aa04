"""Parity vs reference for pure-Python subsystems: edit distance / WER
accounting, LR schedulers, and CTC decoding."""

import numpy as np
import pytest

from tests.parity.conftest import assert_close, to_np


# ---------------------------------------------------------------- WER

def test_edit_distance_parity(ref):
    import speechbrain.utils.edit_distance as ref_ed
    import speechbrain_tpu.utils.edit_distance as ed

    refs = [["a", "b", "c"], ["d", "e"], [], ["x"]]
    hyps = [["a", "x", "c"], ["d", "e", "f"], ["y"], []]
    theirs = ref_ed.accumulatable_wer_stats(refs, hyps)
    ours = ed.accumulatable_wer_stats(refs, hyps)
    # reference returns a Counter without num_edits; compare its keys
    for key in ("WER", "num_ref_tokens", "insertions", "deletions",
                "substitutions"):
        assert ours[key] == theirs[key], (key, ours[key], theirs[key])


def test_wer_details_parity(ref):
    import speechbrain.utils.edit_distance as ref_ed
    import speechbrain_tpu.utils.edit_distance as ed

    ids = ["u1", "u2", "u3"]
    refs = [["the", "cat", "sat"], ["on", "the", "mat"], ["hello"]]
    hyps = [["the", "cat", "sit"], ["on", "mat"], ["hello", "there"]]
    theirs = ref_ed.wer_details_for_batch(ids, refs, hyps, compute_alignments=True)
    ours = ed.wer_details_for_batch(ids, refs, hyps, compute_alignments=True)
    for t, o in zip(theirs, ours):
        for key in ("key", "WER", "insertions", "deletions", "substitutions",
                    "num_edits", "num_ref_tokens"):
            assert o[key] == t[key], (key, o[key], t[key])
        assert o["alignment"] == t["alignment"]

    ts = ref_ed.wer_summary(theirs)
    os_ = ed.wer_summary(ours)
    for key in ("WER", "SER", "num_edits", "num_scored_sents"):
        assert os_[key] == ts[key], (key, os_[key], ts[key])


# ---------------------------------------------------------- schedulers

def test_newbob_scheduler_parity(ref):
    from speechbrain.nnet.schedulers import NewBobScheduler as RefSched
    from speechbrain_tpu.nnet.schedulers import NewBobScheduler

    theirs = RefSched(initial_value=1.0, improvement_threshold=0.0025,
                      annealing_factor=0.5, patient=1)
    ours = NewBobScheduler(initial_value=1.0, improvement_threshold=0.0025,
                           annealing_factor=0.5, patient=1)
    metrics = [10.0, 9.0, 9.0, 9.0, 8.0, 8.5, 8.5, 8.4]
    for m in metrics:
        t_old, t_new = theirs(m)
        o_old, o_new = ours(m)
        assert abs(t_new - o_new) < 1e-9, (m, t_new, o_new)


def test_noam_scheduler_parity(ref):
    from speechbrain.nnet.schedulers import NoamScheduler as RefSched
    from speechbrain_tpu.nnet.schedulers import NoamScheduler

    class _Opt:  # minimal torch-optimizer stand-in for the reference
        def __init__(self):
            self.param_groups = [{"lr": 1.0}]

    theirs = RefSched(lr_initial=1.0, n_warmup_steps=10)
    ours = NoamScheduler(lr_initial=1.0, n_warmup_steps=10)
    opt = _Opt()
    for step in range(1, 30):
        t_old, t_new = theirs(opt)
        lr_ours = ours(step)
        lr_ours = lr_ours[1] if isinstance(lr_ours, tuple) else lr_ours
        assert abs(t_new - float(lr_ours)) < 1e-9, (step, t_new, lr_ours)


@pytest.mark.parametrize("cls,kwargs", [
    ("LinearScheduler", dict(initial_value=1.0, final_value=0.1, epoch_count=10)),
    ("StepScheduler", dict(initial_value=1.0, decay_factor=0.5, decay_drop=3)),
])
def test_simple_schedulers_parity(ref, cls, kwargs):
    import speechbrain.nnet.schedulers as ref_s
    import speechbrain_tpu.nnet.schedulers as s

    theirs = getattr(ref_s, cls)(**kwargs)
    ours = getattr(s, cls)(**kwargs)
    for epoch in range(1, 10):
        t = theirs(epoch)
        o = ours(epoch)
        t_new = t[1] if isinstance(t, tuple) else t
        o_new = o[1] if isinstance(o, tuple) else o
        assert abs(float(t_new) - float(o_new)) < 1e-6, (cls, epoch, t_new, o_new)


# ------------------------------------------------------------ decoders

def test_filter_ctc_output_parity(ref):
    from speechbrain.decoders.ctc import filter_ctc_output as ref_f
    from speechbrain_tpu.decoders.ctc import filter_ctc_output

    seqs = [
        [0, 0, 1, 1, 0, 2, 2, 3],
        [1, 1, 1],
        [0, 0, 0],
        [],
        [3, 0, 3, 3, 0, 0, 3],
    ]
    for s in seqs:
        assert filter_ctc_output(list(s), blank_id=0) == ref_f(list(s), blank_id=0)


def test_ctc_greedy_decode_parity(ref, torch):
    from speechbrain.decoders.ctc import ctc_greedy_decode as ref_g
    from speechbrain_tpu.decoders.ctc import ctc_greedy_decode

    rng = np.random.default_rng(44)
    B, T, C = 3, 15, 6
    probs = rng.standard_normal((B, T, C)).astype(np.float32)
    lens = np.asarray([1.0, 0.8, 0.5], dtype=np.float32)
    theirs = ref_g(torch.tensor(probs), torch.tensor(lens), blank_id=0)
    ours = ctc_greedy_decode(probs, lens, blank_id=0)
    assert [list(u) for u in ours] == [list(u) for u in theirs]


def test_ctc_prefix_scorer_parity(ref, torch):
    """One forward_step of the CTC prefix scorer on identical states."""
    from speechbrain.decoders.ctc import CTCPrefixScorer as RefScorer
    from speechbrain_tpu.decoders.ctc import CTCPrefixScorer

    rng = np.random.default_rng(45)
    B, beam, T, C = 2, 3, 12, 8
    blank, eos = 0, C - 1
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    x = np.log(np.exp(x) / np.exp(x).sum(-1, keepdims=True))
    enc_lens = np.asarray([1.0, 0.75], dtype=np.float32)
    abs_lens = np.round(enc_lens * T).astype(np.int64)

    # reference takes ABSOLUTE frame counts; ours relative lengths
    theirs_sc = RefScorer(
        torch.tensor(x), torch.tensor(abs_lens), B, beam, blank, eos,
        ctc_window_size=0,
    )
    ours_sc = CTCPrefixScorer(
        x, enc_lens, B, beam, blank_index=blank, eos_index=eos
    )

    g = np.tile(np.asarray([[eos]]), (B * beam, 1))
    t_psi, t_state = theirs_sc.forward_step(
        torch.tensor(g), None, candidates=None, attn=None
    )
    o_psi, o_state = ours_sc.forward_step(g, None, candidates=None, attn=None)
    assert_close(o_psi, t_psi, rtol=1e-4, atol=1e-4, what="ctc prefix psi t0")

    # commit token 2 on every beam (identity predecessors), then step 2
    tok = 2
    ref_idx = torch.tensor(
        np.tile(np.arange(beam)[None, :] * C + tok, (B, 1))
    )
    t_state2 = theirs_sc.permute_mem(t_state, ref_idx)
    our_idx = np.tile(np.arange(beam) * C + tok, B)
    o_state2 = ours_sc.permute_mem(o_state, our_idx)

    g2 = np.concatenate([g, np.full((B * beam, 1), tok)], axis=1)
    t_psi2, _ = theirs_sc.forward_step(
        torch.tensor(g2), t_state2, candidates=None, attn=None
    )
    o_psi2, _ = ours_sc.forward_step(g2, o_state2, candidates=None, attn=None)
    assert_close(o_psi2, t_psi2, rtol=1e-4, atol=1e-4, what="ctc prefix psi t1")
