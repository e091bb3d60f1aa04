"""Model-hub repo consistency checks (reference
``tests/consistency/../utils/check_HF_repo.py``).

The reference downloads each recipe's HuggingFace README and executes
its ``python`` code blocks.  This environment has no egress, so the
offline analogue validates the same contract locally:

- ``repo_list``: collect hub links from the recipe registry csv
  (``HF_repo`` field; the field is optional in our registry).
- ``check_repo``: for a LOCAL model-bundle directory (a
  ``save_for_pretrained`` output or any dir with README +
  hyperparams.yaml), verify the advertised interface: the README's
  ``python`` snippets must at least compile, and ``hyperparams.yaml``
  must load through the registry.
- ``run_hf_check``: run ``check_repo`` over every local bundle found
  under a root directory.
"""

import csv
import glob
import logging
import os
import re

logger = logging.getLogger(__name__)

__all__ = ["repo_list", "check_repo", "run_hf_check"]


def repo_list(recipe_csvfile="tests/recipes.csv", field="HF_repo"):
    """Unique hub links from the recipe registry (empty when the
    registry has no such column — the field is optional here)."""
    repos = set()
    with open(recipe_csvfile, newline="") as f:
        for row in csv.DictReader(f):
            link = (row.get(field) or "").strip()
            if link:
                repos.add(link)
    return sorted(repos)


def extract_python_blocks(readme_path):
    """The ``python``-fenced code blocks of a markdown README."""
    with open(readme_path) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


def check_repo(repo_dir):
    """True when a local model bundle is self-consistent: README
    snippets compile and ``hyperparams.yaml`` loads."""
    ok = True
    readme = os.path.join(repo_dir, "README.md")
    if os.path.exists(readme):
        for i, block in enumerate(extract_python_blocks(readme)):
            try:
                compile(block, f"{readme}#block{i}", "exec")
            except SyntaxError as err:
                logger.error("%s block %d: %s", readme, i, err)
                ok = False
    hyper = os.path.join(repo_dir, "hyperparams.yaml")
    if os.path.exists(hyper):
        from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

        try:
            with open(hyper) as f:
                load_hyperpyyaml(f.read())
        except Exception as err:
            logger.error("%s: %s", hyper, err)
            ok = False
    elif not os.path.exists(readme):
        logger.error("%s: neither README.md nor hyperparams.yaml", repo_dir)
        ok = False
    return ok


def run_hf_check(root="."):
    """``check_repo`` over every bundle dir (any dir holding a
    hyperparams.yaml next to model files) under ``root``."""
    ok = True
    seen = set()
    for hyper in glob.glob(
        os.path.join(root, "**", "hyperparams.yaml"), recursive=True
    ):
        repo_dir = os.path.dirname(hyper)
        if repo_dir in seen:
            continue
        seen.add(repo_dir)
        if not check_repo(repo_dir):
            ok = False
    return ok


def run_HF_check(recipe_csvfile="tests/recipes.csv", field="HF_repo"):
    """Reference-named entry point for the repo-bundle check
    (reference ``utils/check_HF_repo.py:run_HF_check``); offline
    analogue of loading every published model card."""
    del recipe_csvfile, field
    return run_hf_check()
