"""Repo-QA consistency: every public function/class has a docstring,
and URL collection works (reference tests/consistency/test_docstrings.py).

All paths are anchored to the repo root so the suite passes from any
cwd (``python -m pytest /root/repo`` from elsewhere).
"""

import os

from speechbrain_tpu.utils.check_docstrings import (
    check_docstrings,
    missing_docstrings,
)
from speechbrain_tpu.utils.check_url import get_all_urls

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def test_docstrings_present():
    """The whole package + templates carry docstrings."""
    missing = missing_docstrings(
        REPO_ROOT, ["speechbrain_tpu", "templates"]
    )
    assert not missing, f"Missing docstrings: {missing[:10]}"
    assert check_docstrings(REPO_ROOT, ["speechbrain_tpu", "templates"])


def test_url_collection():
    """URL scraping runs offline over the repo docs."""
    urls = get_all_urls([os.path.join(REPO_ROOT, "README.md")])
    assert isinstance(urls, dict)
