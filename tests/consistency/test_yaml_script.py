"""Every recipe hyperparameter is consumed by its train script
(reference tests/consistency/test_yaml.py).
"""

import glob
import os

import pytest

from speechbrain_tpu.utils.check_yaml import check_yaml_vs_script

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# Keys legitimately unused by scripts: run-opt-style descriptors
# consumed by the framework, or standard bookkeeping.
IGNORE = (
    "seed", "output_folder", "save_folder", "train_log",
    "sample_rate", "precision", "grad_accumulation_factor",
    "num_workers", "skip_prep",
    # consumed by the Brain engine (run-opt fallbacks)
    "lr", "max_grad_norm", "nonfinite_patience", "loss_sync_interval",
)


def _dynamic_keys(yaml_path, script_path):
    """Vars reached via f-string keys like hparams[f"{split}_json"]
    (including in delegated extra scripts)."""
    import re as _re

    from speechbrain_tpu.utils.check_yaml import _extra_scripts

    text = ""
    for path in [script_path] + _extra_scripts(script_path):
        with open(path) as f:
            text += f.read()
    suffixes = set(_re.findall(r'hparams\[f"\{\w+\}(\w+)"\]', text))
    if not suffixes:
        return set()
    from speechbrain_tpu.utils.check_yaml import get_yaml_var

    return {
        v
        for v in get_yaml_var(yaml_path)
        if any(v.endswith(suf) for suf in suffixes)
    }


def _csv_pairs():
    """Authoritative yaml->script mapping from tests/recipes.csv
    (reference ``tests/recipes.csv`` Script_file/Hparam_file columns)."""
    from speechbrain_tpu.utils.recipe_tests import load_recipe_csv

    csv_path = os.path.join(REPO, "tests", "recipes.csv")
    mapping = {}
    if os.path.exists(csv_path):
        for row in load_recipe_csv(csv_path):
            if row.get("Hparam_file") and row.get("Script_file"):
                mapping[os.path.join(REPO, row["Hparam_file"])] = (
                    os.path.join(REPO, row["Script_file"])
                )
    return mapping


def _pairs():
    csv_pairs = _csv_pairs()
    out = []
    for yaml_path in glob.glob(
        os.path.join(REPO, "recipes", "**", "hparams", "*.yaml"),
        recursive=True,
    ):
        if yaml_path in csv_pairs:
            out.append((yaml_path, csv_pairs[yaml_path]))
            continue
        recipe_dir = os.path.dirname(os.path.dirname(yaml_path))
        for script in ("train.py", "experiment.py",
                       "train_speaker_embeddings.py"):
            script_path = os.path.join(recipe_dir, script)
            if os.path.exists(script_path):
                out.append((yaml_path, script_path))
                break
    return out


@pytest.mark.parametrize(
    "yaml_path,script_path",
    _pairs(),
    ids=[os.path.relpath(y, REPO) for y, _ in _pairs()],
)
def test_yaml_vars_used(yaml_path, script_path):
    ignore = set(IGNORE) | _dynamic_keys(yaml_path, script_path)
    assert check_yaml_vs_script(yaml_path, script_path, ignore=ignore)
