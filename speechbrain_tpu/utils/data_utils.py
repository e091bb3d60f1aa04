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
    "get_all_files",
    "get_list_from_csv",
    "split_list",
    "recursive_items",
    "split_by_whitespace",
    "scalarize",
]


def get_all_files(
    dirName, match_and=None, match_or=None, exclude_and=None, exclude_or=None
):
    """Recursively list files under a folder, filtered by substring
    patterns (reference ``utils/data_utils.py:40``): keep a file iff it
    contains ALL of ``match_and``, ANY of ``match_or``, NONE-violating
    ``exclude_and`` (i.e. drop only if it contains all), and none of
    ``exclude_or``.

    Example
    -------
    >>> import os, tempfile
    >>> d = tempfile.mkdtemp()
    >>> _ = open(os.path.join(d, "a.wav"), "w")
    >>> _ = open(os.path.join(d, "b.txt"), "w")
    >>> [os.path.basename(f) for f in get_all_files(d, match_and=[".wav"])]
    ['a.wav']
    """
    allFiles = []
    for entry in sorted(os.listdir(dirName)):
        fullPath = os.path.join(dirName, entry)
        if os.path.isdir(fullPath):
            allFiles += get_all_files(
                fullPath,
                match_and=match_and,
                match_or=match_or,
                exclude_and=exclude_and,
                exclude_or=exclude_or,
            )
            continue
        if match_and and not all(p in fullPath for p in match_and):
            continue
        if match_or and not any(p in fullPath for p in match_or):
            continue
        if exclude_and and all(p in fullPath for p in exclude_and):
            continue
        if exclude_or and any(p in fullPath for p in exclude_or):
            continue
        allFiles.append(fullPath)
    return allFiles


def get_list_from_csv(csvfile, field, delimiter=",", skipinitialspace=True):
    """Extract one column of a CSV file as a list (reference
    ``utils/data_utils.py:103``)."""
    import csv

    lst = []
    with open(csvfile, newline="") as csvf:
        reader = csv.DictReader(
            csvf, delimiter=delimiter, skipinitialspace=skipinitialspace
        )
        for row in reader:
            lst.append(row[field])
    return lst


def split_list(seq, num):
    """Split a sequence into ``num`` nearly-equal chunks (reference
    ``utils/data_utils.py:128``).

    Example
    -------
    >>> split_list([1, 2, 3, 4, 5, 6, 7, 8, 9], 4)
    [[1, 2], [3, 4], [5, 6], [7, 8, 9]]
    """
    avg = len(seq) / float(num)
    out = []
    last = 0.0
    while last < len(seq):
        out.append(seq[int(last) : int(last + avg)])
        last += avg
    return out


def recursive_items(dictionary):
    """Yield each leaf (key, value) of a nested dictionary (reference
    ``utils/data_utils.py:156``).

    Example
    -------
    >>> list(recursive_items({'lev1': {'lev2': {'lev3': 'v'}}}))
    [('lev3', 'v')]
    """
    for key, value in dictionary.items():
        if type(value) is dict:
            yield from recursive_items(value)
        else:
            yield (key, value)


def split_by_whitespace(text):
    """Functional ``str.split`` (reference ``utils/data_utils.py:353``).

    Example
    -------
    >>> split_by_whitespace("a  b c")
    ['a', 'b', 'c']
    """
    return text.split()


def scalarize(value):
    """Convert a dict/namedtuple of 0-d arrays to Python scalars
    (reference ``utils/data_utils.py:438``).

    Example
    -------
    >>> scalarize({"loss": np.float32(2.0)})
    {'loss': 2.0}
    """
    if hasattr(value, "_asdict"):
        value_dict = value._asdict()
    else:
        value_dict = value
    return {
        key: np.asarray(item_value).item()
        for key, item_value in value_dict.items()
    }


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
    if mode == "constant":
        # Hot path: one allocation + per-row slice copies instead of
        # per-row np.pad + np.stack (collate dominates the host
        # pipeline; measured ~2x on the bench corpus).
        for a in arrays:
            for dim, target in enumerate(target_shape):
                if target < a.shape[dim]:
                    raise ValueError(
                        f"Target shape {target_shape} smaller than "
                        f"input {a.shape}"
                    )
        dtype = np.result_type(*[a.dtype for a in arrays])
        full_shape = (len(arrays),) + tuple(target_shape)
        if value == 0:
            # np.zeros gets calloc'd zero pages (no write pass);
            # np.full writes every byte — measured 30% of the whole
            # host pipeline on 20 MB waveform batches (round 5).
            out = np.zeros(full_shape, dtype)
        else:
            out = np.full(full_shape, value, dtype)
        valid = np.empty(len(arrays), dtype=np.float32)
        for i, a in enumerate(arrays):
            out[(i,) + tuple(slice(0, s) for s in a.shape)] = a
            valid[i] = a.shape[0] / target_shape[0]
        return out, valid
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


def recursive_to(data, *args, **kwargs):
    """Reference-compat name: move a nested structure "to a device" —
    in this framework, normalize leaves to numpy (device placement
    happens at jit boundaries) (reference ``utils/data_utils.py:240``)."""
    del args, kwargs
    return recursive_to_numpy(data)
