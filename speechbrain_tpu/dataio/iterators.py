"""Streaming-data bucketed batching (IterableDataset analogue).

Parity target: reference ``dataio/iterators.py:39,122``
(dynamic_bucketed_batch): pivot-based bucketing with a padding-ratio cap
for infinite/webdataset-style streams.
"""

import random
from dataclasses import dataclass, field
from typing import Any

__all__ = [
    "dynamic_bucketed_batch",
    "indices_around_random_pivot",
    "LengthItem",
    "RatioIndex",
    "total_length_with_padding",
    "padding_ratio",
]


def indices_around_random_pivot(
    databuffer,
    target_batch_numel,
    max_batch_size=None,
    max_batch_numel=None,
    max_padding_ratio=0.2,
    randint_generator=random.randint,
):
    """Pick a random pivot and grow the batch with nearest-length items.

    Returns indices into the buffer (sorted descending for safe pops).
    """
    lengths = [ex["length"] for ex in databuffer]
    pivot_index = randint_generator(0, len(lengths) - 1)
    indices = [pivot_index]
    pivot_len = lengths[pivot_index]
    candidates = sorted(
        (i for i in range(len(lengths)) if i != pivot_index),
        key=lambda i: abs(lengths[i] - pivot_len),
    )
    batch_lens = [pivot_len]
    for i in candidates:
        new_lens = batch_lens + [lengths[i]]
        maxlen = max(new_lens)
        numel = maxlen * len(new_lens)
        padding = numel - sum(new_lens)
        if max_batch_size is not None and len(new_lens) > max_batch_size:
            break
        if max_batch_numel is not None and numel > max_batch_numel:
            continue
        if max_padding_ratio is not None and numel > 0 and (
            padding / numel
        ) > max_padding_ratio:
            continue
        indices.append(i)
        batch_lens = new_lens
        if numel >= target_batch_numel:
            break
    return sorted(indices, reverse=True)


def dynamic_bucketed_batch(
    data,
    make_batch_fn,
    len_key=None,
    len_fn=len,
    min_sample_len=None,
    max_sample_len=None,
    buffersize=1024,
    collate_fn=None,
    drop_end=False,
    **kwargs,
):
    """Yield collated batches from a stream with pivot bucketing.

    Arguments
    ---------
    data : iterable of example dicts
    make_batch_fn : callable or None
        Called with the list of chosen examples (if collate_fn is None).
    len_key : str, optional
        Key whose len_fn gives the example length.
    buffersize : int
        Number of examples buffered before batches are drawn.
    """
    if collate_fn is None:
        collate_fn = make_batch_fn
    databuffer = []
    for example in data:
        length = len_fn(example[len_key]) if len_key is not None else len_fn(example)
        if min_sample_len is not None and length < min_sample_len:
            continue
        if max_sample_len is not None and length > max_sample_len:
            continue
        databuffer.append({"example": example, "length": length})
        if len(databuffer) >= buffersize:
            indices = indices_around_random_pivot(
                databuffer, **kwargs
            )
            batch = [databuffer.pop(i)["example"] for i in indices]
            yield collate_fn(batch)
    while databuffer and not drop_end:
        indices = indices_around_random_pivot(databuffer, **kwargs)
        batch = [databuffer.pop(i)["example"] for i in indices]
        yield collate_fn(batch)


@dataclass(order=True)
class LengthItem:
    """(length, data) pair ordered by length (reference
    ``dataio/iterators.py:14``)."""

    length: int
    data: Any = field(compare=False)


def total_length_with_padding(lengths):
    """Padded batch size in elements (reference
    ``dataio/iterators.py:22``).

    Example
    -------
    >>> total_length_with_padding([3, 5])
    10
    """
    return len(lengths) * max(lengths)


def padding_ratio(lengths):
    """Fraction of a padded batch that is padding (reference
    ``dataio/iterators.py:27``).

    Example
    -------
    >>> padding_ratio([5, 5])
    0.0
    """
    return 1.0 - sum(lengths) / total_length_with_padding(lengths)


@dataclass(order=True)
class RatioIndex:
    """(padding ratio, index) pair (reference
    ``dataio/iterators.py:32``)."""

    ratio: float
    index: int
