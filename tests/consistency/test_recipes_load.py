"""Consistency: every recipe/template YAML loads through the registry.

Mirrors the reference's ``tests/consistency/test_yaml.py`` strategy:
instantiating the full object graph catches missing classes, bad
arguments and registry drift without running training.
"""

import glob
import os

import pytest

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
YAMLS = sorted(
    glob.glob(os.path.join(REPO, "recipes", "**", "*.yaml"), recursive=True)
    + glob.glob(
        os.path.join(REPO, "templates", "**", "*.yaml"), recursive=True
    )
)


@pytest.mark.parametrize("yaml_path", YAMLS, ids=lambda p: os.path.relpath(p, REPO))
def test_yaml_loads(yaml_path, tmp_path):
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    overrides = {
        "data_folder": str(tmp_path),
        "output_folder": str(tmp_path / "results"),
    }
    with open(yaml_path) as f:
        hparams = load_hyperpyyaml(f, overrides)
    # Brain recipes declare modules/model; pipeline recipes (e.g.
    # diarization) declare the embedding model directly; tokenizer
    # recipes declare only the tokenizer constructor.
    assert any(
        k in hparams
        for k in ("modules", "model", "embedding_model", "tokenizer")
    )
