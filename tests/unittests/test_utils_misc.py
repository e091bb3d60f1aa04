"""Coverage for hpopt, profiling, check_yaml, recipe_tests, DER, BLEU."""

import io
import os

import numpy as np
import pytest


def test_hpopt_context_reports():
    from speechbrain_tpu.utils.hpopt import (
        GenericHyperparameterOptimizationReporter,
        HyperparameterOptimizationContext,
        report_result,
    )

    out = io.StringIO()
    with HyperparameterOptimizationContext() as ctx:
        ctx.reporter = GenericHyperparameterOptimizationReporter(
            output=out
        )
        report_result({"objective": 0.25, "epoch": 3})
    assert '"objective": 0.25' in out.getvalue()


def test_report_time_decorator():
    from speechbrain_tpu.utils.profiling import report_time

    @report_time
    def f(x):
        return x * 2

    assert f(21) == 42
    assert f.last_timing_ms >= 0


def test_profile_schedule():
    from speechbrain_tpu.utils.profiling import schedule

    gate = schedule(wait=1, warmup=1, active=2, repeat=1)
    decisions = [gate(i) for i in range(6)]
    assert decisions == [False, False, True, True, False, False]


def test_check_yaml_vs_script(tmp_path):
    from speechbrain_tpu.utils.check_yaml import check_yaml_vs_script

    yaml_file = tmp_path / "h.yaml"
    yaml_file.write_text(
        "lr: 0.1\nn_mels: 40\nunused_var: 3\nderived: !ref <n_mels>\n"
    )
    script = tmp_path / "train.py"
    script.write_text(
        'lr = hparams["lr"]\nmels = hparams["n_mels"]\n'
    )
    assert not check_yaml_vs_script(str(yaml_file), str(script))
    # "derived" feeds another yaml node only; "unused_var" is dead.
    assert check_yaml_vs_script(
        str(yaml_file), str(script), ignore=("unused_var", "derived")
    )


def test_recipe_csv_checks(tmp_path):
    from speechbrain_tpu.utils.recipe_tests import (
        check_files,
        check_performance,
    )

    (tmp_path / "out.txt").write_text("x")
    assert check_files(str(tmp_path), ["out.txt"])
    assert not check_files(str(tmp_path), ["missing.txt"])
    log = tmp_path / "train_log.txt"
    log.write_text(
        "epoch: 1 - train loss: 3.2 - valid PER: 22.0\n"
        "epoch: 2 - train loss: 1.2 - valid PER: 14.5\n"
    )
    assert check_performance(str(log), "PER", 15.0, "min")
    assert not check_performance(str(log), "PER", 10.0, "min")


def test_der_native():
    from speechbrain_tpu.utils.DER import DER

    ref = [
        ["SPEAKER", "r1", "0", 0.0, 5.0, "<NA>", "<NA>", "A", "<NA>"],
        ["SPEAKER", "r1", "0", 5.0, 5.0, "<NA>", "<NA>", "B", "<NA>"],
    ]
    sys_rttm = [
        ["SPEAKER", "r1", "0", 0.0, 5.0, "<NA>", "<NA>", "x", "<NA>"],
        ["SPEAKER", "r1", "0", 5.0, 5.0, "<NA>", "<NA>", "y", "<NA>"],
    ]
    assert DER(ref, sys_rttm, collar=0.0)[-1] == 0.0
    one_spk = [
        ["SPEAKER", "r1", "0", 0.0, 10.0, "<NA>", "<NA>", "z", "<NA>"]
    ]
    assert abs(DER(ref, one_spk, collar=0.0)[-1] - 50.0) < 1e-6


def test_bleu_corpus():
    from speechbrain_tpu.utils.bleu import BLEUStats

    stats = BLEUStats()
    stats.append(
        ids=["u1", "u2"],
        predict=[["the", "cat", "sat"], ["a", "dog"]],
        targets=[[["the", "cat", "sat"]], [["the", "dog"]]],
    )
    bleu = stats.summarize("BLEU")
    assert 0 < bleu <= 100.0


def test_hmm_aligner_lexicon():
    """Multi-pronunciation lexicon graphs: topology matches the
    reference example, forward/viterbi DP match brute-force path
    enumeration over the graph."""
    from itertools import product

    import numpy as np

    from speechbrain_tpu.alignment.aligner import HMMAligner

    al = HMMAligner()
    al.lexicon = {"a": {0: "a"}, "b": {0: "b", 1: "c"}}
    al.lex_lab2ind = {"sil": 0, "a": 1, "b": 2, "c": 3}
    words = [["a", "b"]]
    poss, lens, trans, pi, finals = al.use_lexicon(
        words, interword_sils=True
    )
    assert np.asarray(poss).tolist() == [[0, 1, 0, 2, 3, 0]]
    assert finals == [[3, 4, 5]]
    tr = np.asarray(trans)[0]
    assert np.isclose(tr[0, 0], np.log(0.5), atol=1e-4)
    assert np.isclose(tr[1, 4], np.log(0.25), atol=1e-4)
    poss2, _, _, _, finals2 = al.use_lexicon(words, interword_sils=False)
    assert np.asarray(poss2).tolist() == [[0, 1, 2, 3, 0]]
    assert finals2 == [[2, 3, 4]]

    rng = np.random.default_rng(0)
    T, V = 4, 5
    em = np.log(rng.dirichlet(np.ones(V), size=(1, T)).astype(np.float32))
    fwd = al.forward_graph(
        em, np.ones(1), poss, lens, trans, pi, finals, dp="forward"
    )
    vit, alis = al.forward_graph(
        em, np.ones(1), poss, lens, trans, pi, finals, dp="viterbi"
    )
    U = poss.shape[1]
    pi_np, tr_np, poss_np = (
        np.asarray(pi)[0], np.asarray(trans)[0], np.asarray(poss)[0],
    )
    tot, best = -np.inf, -np.inf
    for path in product(range(U), repeat=T):
        lp = pi_np[path[0]] + em[0, 0, poss_np[path[0]]]
        for t in range(1, T):
            lp += tr_np[path[t - 1], path[t]] + em[0, t, poss_np[path[t]]]
        if path[-1] in finals[0]:
            tot = np.logaddexp(tot, lp)
            best = max(best, lp)
    assert np.isclose(float(fwd[0]), tot, atol=1e-4)
    assert np.isclose(float(vit[0]), best, atol=1e-4)
    assert len(alis[0]) == T


def test_progress_sample_logger(tmp_path):
    from speechbrain_tpu.utils.train_logger import ProgressSampleLogger

    psl = ProgressSampleLogger(
        str(tmp_path),
        formats={"wav": "audio", "raw_batch": "raw"},
        batch_sample_size=2,
    )
    psl.remember(
        mel=np.random.randn(3, 20, 10),
        wav=np.random.randn(2, 800) * 0.1,
        raw_batch={"a": np.ones((4, 3)), "b": {"c": np.zeros(2)}},
    )
    sample = psl.get_batch_sample({"x": np.zeros((5, 2)), "y": "meta"})
    assert sample["x"].shape == (2, 2) and sample["y"] == "meta"
    psl.save(epoch=3)
    out = sorted(os.listdir(tmp_path / "3"))
    assert out == ["mel.png", "raw_batch.npz", "wav.wav"]
    loaded = np.load(tmp_path / "3" / "raw_batch.npz")
    assert loaded["b/c"].shape == (2,)
    psl.reset()
    assert psl.progress_samples == {}


def test_profile_report():
    from speechbrain_tpu.utils.profiling import profile_report, report_memory

    class T:
        def fit_batch(self, batch):
            return sum(batch)

        def evaluate_batch(self, batch, stage=None):
            return 0.0

    t = profile_report(T())
    for _ in range(4):
        t.fit_batch([1, 2])
    t.evaluate_batch([3])
    rep = t.profiler_report
    assert rep["steps"] == 5
    assert rep["p50_ms"] <= rep["max_ms"]
    assert report_memory(rep) == rep["peak_bytes"]
    assert report_memory() >= 0


def test_gabor_impulse_response():
    from speechbrain_tpu.processing.signal_processing import (
        gabor_impulse_response,
        gabor_impulse_response_legacy_complex,
    )

    t = np.arange(-50, 51, dtype=np.float32)
    center = np.array([0.1, 0.5])
    fwhm = np.array([5.0, 12.0])
    g = np.asarray(gabor_impulse_response(t, center, fwhm))
    gl = np.asarray(gabor_impulse_response_legacy_complex(t, center, fwhm))
    assert g.shape == (2, 101) and gl.shape == (2, 101, 2)
    assert np.allclose(np.real(g), gl[..., 0], atol=1e-6)
    assert np.allclose(np.imag(g), gl[..., 1], atol=1e-6)
    # Envelope peaks at t=0 and integrates near 1 (unit-gain gaussian).
    assert np.argmax(np.abs(g[0])) == 50


def test_check_hf_repo(tmp_path):
    from speechbrain_tpu.utils.check_hf_repo import (
        check_repo,
        extract_python_blocks,
        run_hf_check,
    )

    bundle = tmp_path / "model"
    bundle.mkdir()
    (bundle / "README.md").write_text(
        "# Model\n```python\nprint('hello')\n```\n"
    )
    (bundle / "hyperparams.yaml").write_text("foo: 1\nbar: !ref <foo>\n")
    assert extract_python_blocks(bundle / "README.md") == ["print('hello')\n"]
    assert check_repo(str(bundle))
    assert run_hf_check(str(tmp_path))
    (bundle / "README.md").write_text("```python\ndef broken(:\n```\n")
    assert not check_repo(str(bundle))
