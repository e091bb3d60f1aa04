"""Repo-QA: collect (and optionally probe) every URL in the codebase.

Parity target: reference ``utils/check_url.py``.  URL discovery is
fully offline; reachability probing uses urllib and is skipped
gracefully where the environment has no egress.
"""

import logging
import os
import re

logger = logging.getLogger(__name__)

__all__ = ["get_url", "get_all_urls", "check_links"]

_URL_RE = re.compile(r"https?://[^\s'\"\)\]>`,;]+")


def get_url(path):
    """All unique URLs found in one file.

    Example
    -------
    >>> import tempfile
    >>> f = tempfile.NamedTemporaryFile("w", suffix=".md", delete=False)
    >>> _ = f.write("see https://example.com/a and http://example.org.")
    >>> f.close()
    >>> sorted(get_url(f.name))
    ['http://example.org', 'https://example.com/a']
    """
    with open(path, errors="replace") as f:
        text = f.read()
    urls = set(_URL_RE.findall(text))
    return [u.rstrip(".") for u in urls]


def get_all_urls(file_lst, avoid_urls=()):
    """Map URL -> list of files containing it, over many files."""
    all_urls = {}
    for path in file_lst:
        for url in get_url(path):
            if url in avoid_urls:
                continue
            all_urls.setdefault(url, []).append(path)
    return all_urls


def _probe(url, timeout=5):
    import urllib.request

    req = urllib.request.Request(url, method="HEAD")
    try:
        with urllib.request.urlopen(req, timeout=timeout):
            return True
    except Exception:
        return False


def check_links(
    folder=".",
    match_suffixes=(".py", ".md", ".txt", ".yaml"),
    avoid_urls=("http:/", "http://", "https:/", "https://"),
    probe=False,
):
    """Collect URLs under ``folder``; with ``probe=True`` also HEAD-check
    each (requires network egress).  Returns ``{url: [files]}`` of the
    broken (or, without probing, all) URLs.
    """
    file_lst = []
    for root, _, files in os.walk(folder):
        if any(part.startswith(".") for part in root.split(os.sep)):
            continue
        for fn in files:
            if fn.endswith(tuple(match_suffixes)):
                file_lst.append(os.path.join(root, fn))
    urls = get_all_urls(file_lst, avoid_urls)
    if not probe:
        return urls
    broken = {}
    for url, paths in urls.items():
        if not _probe(url):
            logger.error(f"Unreachable URL {url} (in {paths})")
            broken[url] = paths
    return broken


def check_url(path):
    """Check the reachability of every URL in one file; returns the
    list of broken URLs (reference ``utils/check_url.py``)."""
    bad = []
    for url in get_url(path):
        if not _probe(url):
            bad.append(url)
    return bad
