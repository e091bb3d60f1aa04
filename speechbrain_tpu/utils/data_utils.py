"""Host-side data manipulation helpers: padding, batching, dict traversal.

Padding here is numpy-based (host side).  On-device masking uses
``speechbrain_tpu.dataio.dataio.length_to_mask``.

Parity targets: reference ``utils/data_utils.py:391`` (batch_pad_right)
and assorted helpers.
"""

import collections.abc
import math
import os
import re
import urllib.request

import numpy as np

__all__ = [
    "pad_right_to",
    "batch_pad_right",
    "mod_default_collate",
    "split_path",
    "recursive_update",
    "recursive_to_numpy",
    "undo_padding",
    "download_file",
    "ceil_to_bucket",
]


def pad_right_to(array, target_shape, mode="constant", value=0.0):
    """Pad ``array`` (numpy) on the right of each dim up to ``target_shape``.

    Returns (padded, valid_percent) where valid_percent[i] is the fraction
    of dim i that holds real data — the relative-length convention used
    throughout the framework.

    Example
    -------
    >>> x, valid = pad_right_to(np.ones((2, 3)), (4, 5))
    >>> x.shape
    (4, 5)
    >>> valid
    [0.5, 0.6]
    """
    array = np.asarray(array)
    if len(target_shape) != array.ndim:
        raise ValueError("target_shape must match number of dims")
    pads = []
    valid_percent = []
    for i, target in enumerate(target_shape):
        if target < array.shape[i]:
            raise ValueError(
                f"Target shape {target_shape} smaller than input {array.shape}"
            )
        pads.append((0, target - array.shape[i]))
        valid_percent.append(array.shape[i] / target)
    padded = np.pad(array, pads, mode=mode, constant_values=value)
    return padded, valid_percent


def batch_pad_right(arrays, mode="constant", value=0.0, target_shape=None):
    """Stack a list of numpy arrays, right-padding each to the batch max.

    Returns (batched, relative_lengths) where relative_lengths is the
    per-example fraction of the *first* dimension that is real data.

    Arguments
    ---------
    target_shape : tuple, optional
        Pad every example to this shape instead of the observed max —
        used for bucketed fixed shapes so XLA compiles a bounded set of
        programs (SURVEY.md §5.7 TPU note).
    """
    if not len(arrays):
        raise IndexError("Cannot batch empty list")
    arrays = [np.asarray(a) for a in arrays]
    if any(a.ndim != arrays[0].ndim for a in arrays):
        raise IndexError("All examples must have the same number of dims")
    if arrays[0].ndim == 0:
        return np.stack(arrays), np.ones(len(arrays), dtype=np.float32)
    if target_shape is None:
        target_shape = tuple(
            max(a.shape[dim] for a in arrays) for dim in range(arrays[0].ndim)
        )
    padded, valid = [], []
    for a in arrays:
        p, v = pad_right_to(a, target_shape, mode=mode, value=value)
        padded.append(p)
        valid.append(v[0])
    return np.stack(padded), np.asarray(valid, dtype=np.float32)


def mod_default_collate(batch):
    """Collate a list of equal-shape elements into a stacked numpy array.

    Non-array leaves are returned as a plain list.
    """
    elem = batch[0]
    if isinstance(elem, np.ndarray):
        return np.stack(batch)
    if isinstance(elem, (int, np.integer)):
        return np.asarray(batch, dtype=np.int64)
    if isinstance(elem, (float, np.floating)):
        return np.asarray(batch, dtype=np.float32)
    return batch


def undo_padding(batch, lengths):
    """Trim padded rows back to python lists of their true length.

    Example
    -------
    >>> undo_padding(np.array([[1, 2, 0], [3, 4, 5]]), np.array([2/3, 1.0]))
    [[1, 2], [3, 4, 5]]
    """
    batch = np.asarray(batch)
    lengths = np.asarray(lengths)
    batch_max_len = batch.shape[1]
    as_list = []
    for seq, rel_length in zip(batch, lengths):
        actual_size = int(round(float(rel_length) * batch_max_len))
        as_list.append(seq[:actual_size].tolist())
    return as_list


def split_path(path):
    """Split a path or URL into (source_dir, filename).

    Example
    -------
    >>> split_path("/a/b/c.txt")
    ('/a/b', 'c.txt')
    >>> split_path("https://host/f.yaml")
    ('https://host', 'f.yaml')
    """
    if "/" in path:
        return tuple(path.rsplit("/", 1))
    return "./", path


def recursive_update(d, u, must_match=False):
    """Recursively update mapping ``d`` with mapping ``u`` in place."""
    for k, v in u.items():
        if isinstance(v, collections.abc.Mapping) and k in d:
            recursive_update(d[k], v, must_match=must_match)
        elif must_match and k not in d:
            raise KeyError(
                f"Override '{k}' not found in: {[key for key in d.keys()]}"
            )
        else:
            d[k] = v


def recursive_to_numpy(data):
    """Recursively convert array-likes in nested containers to numpy."""
    if isinstance(data, dict):
        return {k: recursive_to_numpy(v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return type(data)(recursive_to_numpy(v) for v in data)
    if hasattr(data, "__array__"):
        return np.asarray(data)
    return data


def download_file(source, dest, replace_existing=False):
    """Download ``source`` URL (or copy a local file) to ``dest``."""
    dest_dir = os.path.dirname(os.path.abspath(dest))
    os.makedirs(dest_dir, exist_ok=True)
    if os.path.exists(dest) and not replace_existing:
        return
    if re.match(r"^[a-z]+://", source):
        urllib.request.urlretrieve(source, dest)
    else:
        import shutil

        shutil.copy(source, dest)


def ceil_to_bucket(n, buckets):
    """Smallest bucket >= n; buckets must be sorted ascending.

    The core of XLA-friendly shape quantization: time/batch dims are
    rounded up to a fixed menu so jit compiles a bounded program set.

    Example
    -------
    >>> ceil_to_bucket(130, [128, 256, 512])
    256
    """
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"Length {n} exceeds largest bucket {buckets[-1]}")


def round_up(x, multiple):
    """Round x up to the nearest multiple (TPU lane/sublane alignment)."""
    return int(math.ceil(x / multiple) * multiple)
