"""Dynamic code loading helpers.

Parity target: reference ``utils/superpowers.py:20`` (import_from_path),
used by ``pretrained.foreign_class`` to load custom interface classes
shipped inside model repos.
"""

import importlib.util
import pathlib

__all__ = ["import_from_path", "run_shell"]


def import_from_path(path):
    """Import a python file as a module object."""
    path = pathlib.Path(path)
    modulename = path.stem
    spec = importlib.util.spec_from_file_location(modulename, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def run_shell(cmd):
    """Run a shell command, returning (output, err, return_code)."""
    import subprocess

    p = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, shell=True
    )
    output, err = p.communicate()
    return output, err, p.returncode
