"""Utilities for hparams files (reference ``utils/hparams.py``)."""


def choice(value, choices, default=None):
    """A "switch statement" for hparams files: a top-level flag picks
    one of several pre-built options (reference ``utils/hparams.py:8``).

    Example
    -------
    >>> choice("b", {"a": 1, "b": 2})
    2
    >>> choice("z", {"a": 1}, default=0)
    0

    Typical YAML use::

        encoder_emb: !apply:speechbrain_tpu.utils.hparams.choice
            value: !ref <embedding_type>
            choices:
                regular: !ref <encoder_emb>
                normalized: !ref <encoder_emb_norm>
    """
    return choices.get(value, default)
