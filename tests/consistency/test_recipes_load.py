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
    p
    for p in glob.glob(
        os.path.join(REPO, "recipes", "**", "*.yaml"), recursive=True
    )
    + glob.glob(
        os.path.join(REPO, "templates", "**", "*.yaml"), recursive=True
    )
    # Exclude experiment artifacts from local template runs.
    if "/results/" not in p and "/save/" not in p
)


@pytest.mark.parametrize("yaml_path", YAMLS, ids=lambda p: os.path.relpath(p, REPO))
def test_yaml_loads(yaml_path, tmp_path, monkeypatch):
    import sys

    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    # Recipes may declare local custom models (!new:custom_model.X)
    # that live next to the yaml's train.py or in a sibling step dir
    # (templates/speech_recognition/ASR uses the LM's custom_model).
    recipe_dir = os.path.dirname(yaml_path)
    if os.path.basename(recipe_dir) == "hparams":
        recipe_dir = os.path.dirname(recipe_dir)
    family_dir = os.path.dirname(recipe_dir)
    for path in [recipe_dir] + sorted(
        os.path.join(family_dir, d)
        for d in (os.listdir(family_dir) if os.path.isdir(family_dir) else [])
        if os.path.isdir(os.path.join(family_dir, d))
    ):
        monkeypatch.syspath_prepend(path)
    # Distinct recipes ship distinct custom_model.py files: force a
    # fresh import with this recipe's path order.
    monkeypatch.delitem(sys.modules, "custom_model", raising=False)

    overrides = {
        "data_folder": str(tmp_path),
        "output_folder": str(tmp_path / "results"),
        # dataset-generation configs (LibriParty generate_dataset)
        "out_folder": str(tmp_path / "out"),
        "librispeech_root": str(tmp_path),
        "rirs_noises_root": str(tmp_path),
    }
    with open(yaml_path) as f:
        text = f.read()
    hparams = load_hyperpyyaml(text, overrides)
    if "!new:" not in text and "!name:" not in text:
        # Pure-scalar overlay (e.g. an hpopt trial overlay): loading
        # cleanly is the whole contract.
        assert isinstance(hparams, dict)
        return
    # Brain recipes declare modules/model; pipeline recipes (e.g.
    # diarization) declare the embedding model directly; tokenizer
    # recipes declare only the tokenizer constructor.
    assert any(
        k in hparams
        for k in ("modules", "model", "embedding_model", "tokenizer")
    )
