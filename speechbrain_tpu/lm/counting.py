"""n-gram counting utilities.

Parity targets: reference ``lm/counting.py:16`` (pad_ends), ``:62``
(ngrams / ngrams_for_evaluation).
"""

import itertools

__all__ = ["pad_ends", "ngrams", "ngrams_for_evaluation"]


def pad_ends(
    sequence, pad_left=True, left_pad_symbol="<s>", right_pad_symbol="</s>"
):
    """Pad a sentence with start/end symbols.

    Example
    -------
    >>> list(pad_ends(["a", "b"]))
    ['<s>', 'a', 'b', '</s>']
    """
    if pad_left:
        return itertools.chain(
            (left_pad_symbol,), tuple(sequence), (right_pad_symbol,)
        )
    return itertools.chain(tuple(sequence), (right_pad_symbol,))


def ngrams(sequence, n):
    """Yield n-gram tuples over the sequence.

    Example
    -------
    >>> list(ngrams([1, 2, 3, 4], 2))
    [(1, 2), (2, 3), (3, 4)]
    """
    if n <= 0:
        raise ValueError("N must be >=1")
    sequence = iter(sequence)
    history = list(itertools.islice(sequence, n - 1))
    for item in sequence:
        history.append(item)
        yield tuple(history)
        del history[0]


def ngrams_for_evaluation(sequence, max_n, predict_first=False):
    """Yield (token, context) pairs with growing context up to max_n-1.

    Example
    -------
    >>> [(t, c) for t, c in ngrams_for_evaluation(["a", "b", "c"], 3)]
    [('b', ('a',)), ('c', ('a', 'b'))]
    """
    if max_n <= 0:
        raise ValueError("Max N must be >=1")
    history = []
    sequence = iter(sequence)
    if not predict_first:
        history.append(next(sequence))
    for item in sequence:
        if len(history) >= max_n:
            del history[0]
        yield item, tuple(history)
        history.append(item)
