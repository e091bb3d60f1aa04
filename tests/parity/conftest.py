"""Golden numeric parity vs the reference implementation.

The reference (PyTorch SpeechBrain at /root/reference) runs on CPU
torch with a handful of import stubs for packages absent from this
image (hyperpyyaml, torchaudio, ruamel.yaml, sentencepiece — none of
which the compared numerics touch).  Each test drives the SAME inputs
(and, for parameterized modules, transplanted weights) through both
implementations and asserts numeric agreement, making the reference's
own code the oracle instead of re-derived expectations.

Skipped wholesale when /root/reference is absent (e.g. end-user
installs of this framework).
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


_CREATED_STUBS = []


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for key, val in attrs.items():
        setattr(mod, key, val)
    sys.modules[name] = mod
    _CREATED_STUBS.append(name)
    return mod


@pytest.fixture(scope="package", autouse=True)
def _cleanup_stubs():
    """Remove the dep stubs once the parity package finishes.

    A lingering ``sentencepiece`` stub (``__spec__ is None``) breaks
    transformers' availability probe in the LATER-collected HF interop
    tests — they skipped in full-suite runs while passing individually
    (the round-4 suite's 9 unexplained skips)."""
    yield
    for name in _CREATED_STUBS:
        sys.modules.pop(name, None)
    _CREATED_STUBS.clear()


def _install_reference():
    """Import the reference package with non-numeric deps stubbed."""
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "speechbrain")):
        pytest.skip("reference checkout not available", allow_module_level=True)
    _stub(
        "hyperpyyaml",
        load_hyperpyyaml=lambda *a, **k: None,
        resolve_references=lambda *a, **k: None,
        dump_hyperpyyaml=lambda *a, **k: None,
    )
    ta = _stub(
        "torchaudio",
        set_audio_backend=lambda *a, **k: None,
        get_audio_backend=lambda: "soundfile",
        info=lambda *a, **k: None,
        load=lambda *a, **k: None,
        save=lambda *a, **k: None,
    )
    ta.transforms = _stub("torchaudio.transforms")
    ruamel = _stub("ruamel")
    ruamel.yaml = _stub("ruamel.yaml", YAML=object)
    _stub(
        "sentencepiece",
        SentencePieceProcessor=object,
        SentencePieceTrainer=object,
    )
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import speechbrain  # noqa: F401

    return speechbrain


@pytest.fixture(scope="session")
def ref():
    """The reference `speechbrain` package (torch CPU), stub-imported."""
    return _install_reference()


@pytest.fixture(scope="session")
def torch(ref):
    import torch as _torch

    _torch.manual_seed(0)
    return _torch


def to_np(x):
    """torch tensor | jax array -> numpy."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what=""):
    a, b = to_np(ours), to_np(theirs)
    assert a.shape == b.shape, f"{what}: shape {a.shape} vs {b.shape}"
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=what)
