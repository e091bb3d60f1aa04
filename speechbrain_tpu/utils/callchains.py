"""Chaining together callables, if some may accept a ``lengths`` argument.

TPU-native counterpart of the reference ``utils/callchains.py`` (see
``speechbrain/utils/callchains.py:1-77``): a host-side composition
helper used to pipe a value through a list of callables, forwarding the
relative-``lengths`` tensor only to those whose signature accepts it.
The in-graph analogue for Flax modules lives in
``speechbrain_tpu/nnet/containers.py`` (``LengthsCapableSequential``);
this module covers the plain-Python chain (e.g. label pipelines,
pretrained-interface post-processing).
"""

import functools
import inspect


def lengths_arg_exists(func):
    """Check if a callable accepts a ``lengths`` keyword argument.

    Reference ``utils/callchains.py:4``.

    Example
    -------
    >>> def f(x, lengths=None):
    ...     return x
    >>> lengths_arg_exists(f)
    True
    >>> lengths_arg_exists(lambda x: x)
    False
    """
    try:
        spec = inspect.signature(func)
    except (TypeError, ValueError):
        return False
    return "lengths" in spec.parameters


class LengthsCapableChain:
    """Chain together callables; forward ``lengths`` where accepted.

    Reference ``utils/callchains.py:17``.  If a callable returns a
    tuple, only the first element is passed onward (matching the
    reference's convention for (output, attn)-style returns).

    Arguments
    ---------
    *funcs : list, optional
        Any number of callables, added in order of execution.

    Example
    -------
    >>> chain = LengthsCapableChain(lambda x: 2 * x)
    >>> chain.append(lambda x, lengths: x + lengths)
    >>> chain(10, lengths=1)
    21
    """

    def __init__(self, *funcs):
        self.funcs = []
        self.takes_lengths = []
        for func in funcs:
            self.append(func)

    def __call__(self, x, lengths=None):
        """Run the chain; returns None if empty (reference behaviour)."""
        if not self.funcs:
            return None
        for func, give_lengths in zip(self.funcs, self.takes_lengths):
            if give_lengths:
                x = func(x, lengths=lengths)
            else:
                x = func(x)
            if isinstance(x, tuple):
                x = x[0]
        return x

    def append(self, func):
        """Add a callable to the end of the chain."""
        self.funcs.append(func)
        self.takes_lengths.append(lengths_arg_exists(func))

    def __str__(self):
        clsname = self.__class__.__name__
        if self.funcs:
            listing = "\n".join(str(f) for f in self.funcs)
            return f"{clsname}:\n{listing}"
        return f"Empty {clsname}"
