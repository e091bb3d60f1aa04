"""Repo-QA: verify every public function/class carries a docstring.

Parity target: reference ``utils/check_docstrings.py`` — re-designed on
``ast`` instead of regex line-scanning, so decorators, async defs and
nested classes are handled correctly.
"""

import ast
import logging
import os

logger = logging.getLogger(__name__)

__all__ = ["check_docstrings", "missing_docstrings"]


def _iter_py_files(base_folder, check_folders):
    for folder in check_folders:
        root_dir = os.path.join(base_folder, folder)
        for root, _, files in os.walk(root_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    yield os.path.join(root, fn)


def missing_docstrings(
    base_folder=".",
    check_folders=("speechbrain_tpu", "tools", "templates"),
    include_private=False,
):
    """Return ``[(path, lineno, qualname), ...]`` for every function or
    class definition without a docstring.

    Private names (leading underscore) and ``__init__``-style dunders
    are skipped unless ``include_private`` — their behavior is
    documented at the class level, matching the reference's policy of
    skipping ``_``-prefixed definitions.

    Example
    -------
    >>> import tempfile, os
    >>> d = tempfile.mkdtemp(); os.makedirs(os.path.join(d, "pkg"))
    >>> _ = open(os.path.join(d, "pkg", "m.py"), "w").write(
    ...     "def documented():\\n    '''Doc.'''\\n\\ndef bare():\\n    pass\\n")
    >>> [(q, l) for _, l, q in missing_docstrings(d, ["pkg"])]
    [('bare', 4)]
    """
    missing = []
    for path in sorted(_iter_py_files(base_folder, check_folders)):
        try:
            with open(path) as f:
                tree = ast.parse(f.read(), filename=path)
        except SyntaxError as e:
            missing.append((path, e.lineno or 0, "<syntax error>"))
            continue
        stack = [(tree, "")]
        while stack:
            node, prefix = stack.pop()
            for child in ast.iter_child_nodes(node):
                if isinstance(
                    child,
                    (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
                ):
                    name = child.name
                    qual = f"{prefix}{name}"
                    private = name.startswith("_")
                    if (include_private or not private) and (
                        ast.get_docstring(child) is None
                    ):
                        missing.append((path, child.lineno, qual))
                    # Closures inside functions are implementation
                    # detail — only recurse into modules and classes.
                    if isinstance(child, ast.ClassDef):
                        stack.append((child, qual + "."))
    return missing


def check_docstrings(
    base_folder=".",
    check_folders=("speechbrain_tpu", "tools", "templates"),
):
    """True iff every public function/class in the given folders has a
    docstring; logs each offender (reference check_docstrings
    semantics).
    """
    missing = missing_docstrings(base_folder, check_folders)
    for path, lineno, qual in missing:
        logger.error(f"Missing docstring: {path}:{lineno} ({qual})")
    return not missing


def extractName(s, search_decorators=False):
    """Extract the function/class name from a definition line
    (reference ``utils/check_docstrings.py``).

    Example
    -------
    >>> extractName("def my_fn(x):")
    'my_fn'
    >>> extractName("class MyClass(Base):")
    'MyClass'
    """
    del search_decorators
    s = s.strip()
    for prefix in ("def ", "class "):
        if s.startswith(prefix):
            rest = s[len(prefix):]
            for sep in "(:":
                idx = rest.find(sep)
                if idx != -1:
                    rest = rest[:idx]
            return rest.strip()
    return ""
