"""Pretrainer: collect parameter files and load them via transfer hooks.

Parity target: reference ``utils/parameter_transfer.py:23``.
"""

import logging
import os
import pathlib

from speechbrain_tpu.utils.checkpoints import (
    DEFAULT_TRANSFER_HOOKS,
    get_default_hook,
)

logger = logging.getLogger(__name__)

__all__ = ["Pretrainer"]


class Pretrainer:
    """Link external parameter files to loadables and transfer them.

    Arguments
    ---------
    collect_in : str
        Directory where files are collected (symlinked/copied).
    loadables : dict
        name -> object with a transfer hook (e.g. Recoverable).
    paths : dict
        name -> source path/URL (per-loadable override).
    """

    def __init__(self, collect_in="./model_checkpoints", loadables=None, paths=None):
        self.loadables = {}
        self.collect_in = pathlib.Path(collect_in)
        if loadables is not None:
            self.add_loadables(loadables)
        self.paths = {}
        if paths is not None:
            self.add_paths(paths)
        self.is_local = []

    def add_loadables(self, loadables):
        """Register objects whose parameters get fetched+loaded."""
        self.loadables.update(loadables)

    def add_paths(self, paths):
        """Register source paths for named loadables."""
        self.paths.update(paths)

    def collect_files(self, default_source=None):
        """Fetch each loadable's parameter file into collect_in.

        Returns dict name -> local path.
        """
        from speechbrain_tpu.pretrained.fetching import fetch

        os.makedirs(self.collect_in, exist_ok=True)
        loadable_paths = {}
        for name in self.loadables:
            filename = f"{name}.ckpt"
            source = default_source
            if name in self.paths:
                source, filename = os.path.split(self.paths[name])
            if source is None:
                raise ValueError(
                    f"No source for loadable {name}; pass paths or "
                    "default_source"
                )
            path = fetch(
                filename=filename,
                source=source,
                savedir=str(self.collect_in),
            )
            loadable_paths[name] = path
        return loadable_paths

    def load_collected(self, device=None):
        """Call each loadable's transfer hook with its collected file."""
        paramfiles = {}
        for name in self.loadables:
            filename = f"{name}.ckpt"
            if name in self.paths:
                filename = os.path.basename(self.paths[name])
            paramfiles[name] = self.collect_in / filename
        self._call_load_hooks(paramfiles)

    def _call_load_hooks(self, paramfiles):
        for name, obj in self.loadables.items():
            loadpath = pathlib.Path(paramfiles[name])
            hook = get_default_hook(obj, DEFAULT_TRANSFER_HOOKS)
            if hook is not None:
                hook(obj, loadpath)
                continue
            raise RuntimeError(
                f"Don't know how to transfer-load {type(obj)}; register a "
                "@mark_as_transfer hook or wrap in Recoverable."
            )
