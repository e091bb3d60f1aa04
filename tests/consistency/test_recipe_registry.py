"""Consistency: every row of tests/recipes.csv is valid.

Mirrors the reference ``tests/consistency/test_recipe.py`` over
``tests/recipes.csv`` (160 rows there): script, hparams and prep files
must exist, debug flags must be parseable run-opts, and every recipe
directory must be registered.
"""

import glob
import os

import pytest

from speechbrain_tpu.utils.recipe_tests import load_recipe_csv

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
CSV = os.path.join(REPO, "tests", "recipes.csv")
ROWS = load_recipe_csv(CSV)


@pytest.mark.parametrize(
    "row", ROWS, ids=[r["RecipeID"] for r in ROWS]
)
def test_row_files_exist(row):
    for key in ("Script_file", "Hparam_file", "Data_prep_file"):
        path = row.get(key, "")
        if not path:
            continue
        assert os.path.exists(
            os.path.join(REPO, path)
        ), f"{row['RecipeID']}: missing {key} {path}"


@pytest.mark.parametrize(
    "row", ROWS, ids=[r["RecipeID"] for r in ROWS]
)
def test_row_debug_flags_parse(row):
    """Debug flags must be run-opts parse_arguments accepts."""
    from speechbrain_tpu.core import parse_arguments

    argv = [row["Hparam_file"]] + row["test_debug_flags"].split()
    _, run_opts, _ = parse_arguments(argv)
    assert run_opts["debug"] is True


def test_every_recipe_registered():
    """Each recipe train script appears in the registry."""
    registered = {row["Script_file"] for row in ROWS}
    on_disk = {
        os.path.relpath(p, REPO)
        for p in glob.glob(
            os.path.join(REPO, "recipes", "**", "train*.py"),
            recursive=True,
        )
    }
    missing = on_disk - registered
    assert not missing, f"Unregistered recipe scripts: {sorted(missing)}"


def test_every_corpus_has_readme():
    """Mirrors the reference's recipe-README consistency check."""
    import csv
    import os

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    with open(os.path.join(repo, "tests", "recipes.csv"), newline="") as f:
        corpora = {
            row["Dataset"]
            for row in csv.DictReader(f)
            # template rows live under templates/, not recipes/<corpus>
            if not row["Script_file"].startswith("templates/")
        }
    missing = [
        c
        for c in corpora
        if not os.path.exists(
            os.path.join(repo, "recipes", c, "README.md")
        )
    ]
    assert not missing, f"corpora without README.md: {missing}"
