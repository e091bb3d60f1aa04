"""Tools for homograph disambiguation (G2P fine-tuning).

TPU-native counterpart of the reference
``lobes/models/g2p/homograph.py:9`` (``SubsequenceLoss``) and ``:151``
(``SubsequenceExtractor``): a loss applied to only the target word
(the homograph) inside each predicted phoneme sequence.

Design notes (vs the torch original): the original extracts ragged
subsequences with boolean-mask ``view``s; here every extraction is a
``vmap``-ed ``lax.dynamic_slice`` of a fixed ``max_subsequence_len``
window, so the whole loss jits with static shapes.  The subsequence
window length is taken from the batch maximum when called eagerly, or
pinned by the caller inside ``jit``.
"""

import jax
import jax.numpy as jnp
import numpy as np


class SubsequenceLoss:
    """A loss for a specific word in the output (the homograph).

    1. find the word index of each target word in the target sequence,
    2. locate that word's boundaries in the *predicted* sequence by
       counting argmax-decoded word separators,
    3. apply ``seq_cost`` to the extracted subsequences only.

    Can be used for fine-tuning only: the model must already predict
    word boundaries correctly (reference ``homograph.py:9``).

    Arguments
    ---------
    seq_cost : callable
        loss applied to (p_seq_subseq, phns_subseq, rel_lengths).
    word_separator : int
        index of the space token in the phoneme inventory.
    word_separator_base : int
        separator index in unprocessed targets (tokenized setups).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> from speechbrain_tpu.nnet.losses import nll_loss
    >>> loss = SubsequenceLoss(seq_cost=nll_loss)
    >>> phns = jnp.array(
    ...     [[1, 2, 0, 1, 3, 0, 2, 1, 0],
    ...      [2, 1, 3, 0, 1, 2, 0, 3, 2]], dtype=jnp.float32)
    >>> phn_lens = jnp.array([8, 9])
    >>> start = jnp.array([3, 4])
    >>> end = jnp.array([5, 7])
    >>> p_seq = jax.nn.one_hot(
    ...     jnp.array([[1, 2, 0, 1, 3, 0, 2, 1, 0],
    ...                [2, 1, 3, 0, 1, 2, 0, 3, 2]]), 4)
    >>> round(float(loss(phns, phn_lens, p_seq, start, end)), 4)
    -0.8
    """

    def __init__(self, seq_cost, word_separator=0, word_separator_base=0):
        self.seq_cost = seq_cost
        self._subsequence_extractor = SubsequenceExtractor(
            word_separator, word_separator_base
        )

    @property
    def word_separator(self):
        """The word separator being used."""
        return self._subsequence_extractor.word_separator

    @word_separator.setter
    def word_separator(self, value):
        """Sets the word separator token index."""
        self._subsequence_extractor.word_separator = value

    @property
    def word_separator_base(self):
        """The base (unprocessed-target) word separator."""
        return self._subsequence_extractor.word_separator_base

    @word_separator_base.setter
    def word_separator_base(self, value):
        """Sets the base (unprocessed-target) word separator index."""
        self._subsequence_extractor.word_separator_base = value

    def __call__(
        self,
        phns,
        phn_lens,
        p_seq,
        subsequence_phn_start,
        subsequence_phn_end,
        phns_base=None,
        phn_lens_base=None,
        max_subsequence_len=None,
    ):
        """Evaluates the subsequence loss; see class docstring."""
        (
            p_seq_subsequence,
            phns_subsequence,
            subsequence_lengths,
        ) = self._subsequence_extractor(
            phns,
            phn_lens,
            p_seq,
            subsequence_phn_start,
            subsequence_phn_end,
            phns_base,
            phn_lens_base,
            max_subsequence_len=max_subsequence_len,
        )
        return self.seq_cost(
            p_seq_subsequence, phns_subsequence, subsequence_lengths
        )


class SubsequenceExtractor:
    """Extracts target-word subsequences out of a batch of sequences
    (reference ``homograph.py:151``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> ex = SubsequenceExtractor()
    >>> phns = jnp.array(
    ...     [[1, 2, 0, 1, 3, 0, 2, 1, 0],
    ...      [2, 1, 3, 0, 1, 2, 0, 3, 2]], dtype=jnp.float32)
    >>> phn_lens = jnp.array([8, 9])
    >>> p_seq = jax.nn.one_hot(
    ...     jnp.array([[1, 2, 0, 1, 3, 0, 2, 1, 0],
    ...                [2, 1, 3, 0, 1, 2, 0, 3, 2]]), 4)
    >>> p_sub, phn_sub, lens = ex.extract_seq(
    ...     phns, phn_lens, p_seq, jnp.array([3, 4]), jnp.array([5, 7]))
    >>> phn_sub.tolist()
    [[1.0, 3.0, 0.0], [1.0, 2.0, 0.0]]
    >>> [round(float(v), 4) for v in lens]
    [0.6667, 1.0]
    """

    def __init__(self, word_separator=0, word_separator_base=None):
        self.word_separator = word_separator
        if word_separator_base is None:
            word_separator_base = word_separator
        self.word_separator_base = word_separator_base

    def __call__(self, *args, **kwargs):
        return self.extract_seq(*args, **kwargs)

    def extract_seq(
        self,
        phns,
        phn_lens,
        p_seq,
        subsequence_phn_start,
        subsequence_phn_end,
        phns_base=None,
        phn_base_lens=None,
        max_subsequence_len=None,
    ):
        """Extract the target-word subsequence from the full sequence.

        Returns ``(p_seq_subsequence, phns_subsequence,
        subsequence_lengths)`` where lengths are relative to the
        (static) subsequence window.  ``max_subsequence_len`` pins the
        window length for use under ``jit``; eagerly it defaults to the
        batch max of ``end - start``.
        """
        has_base = phns_base is not None or phn_base_lens is not None
        if has_base and (phns_base is None or phn_base_lens is None):
            raise ValueError(
                "phns_base and phn_base_lens must be provided together"
            )
        if not has_base:
            phns_base = phns
            phn_base_lens = phn_lens

        subsequence_lengths = subsequence_phn_end - subsequence_phn_start
        if max_subsequence_len is None:
            longest = int(np.asarray(jnp.max(subsequence_lengths)))
        else:
            longest = int(max_subsequence_len)
        longest = max(longest, 1)

        p_seq_edge = p_seq.shape[1]
        phns_edge = (phns.shape[1] * phn_lens).astype(jnp.int32)

        # Pad so a window starting at the sequence edge stays in-bounds.
        phns_p = jnp.pad(phns, ((0, 0), (0, longest)))
        phns_base_p = jnp.pad(phns_base, ((0, 0), (0, longest)))
        p_seq_p = jnp.pad(
            p_seq, ((0, 0), (0, p_seq.shape[1] + longest), (0, 0))
        )

        # Which word (by separator count) holds the target subsequence.
        range_base = jnp.arange(phns_base_p.shape[1])[None, :]
        target_word_indexes = self._get_target_word_indexes(
            phns_base_p,
            range_base,
            subsequence_phn_start[:, None],
            self.word_separator_base,
            phn_lens=phn_base_lens,
        )

        if has_base:
            phns_subsequence, subsequence_lengths = (
                self._slice_target_word(
                    phns_p, target_word_indexes, longest, phns_edge,
                    self.word_separator,
                )
            )
        else:
            # Targets are aligned: slice directly at the given start.
            phns_subsequence = _batch_slice(
                phns_p, subsequence_phn_start, longest
            )
            sub_range = jnp.arange(longest)[None, :]
            phns_subsequence = jnp.where(
                sub_range >= subsequence_lengths[:, None],
                0.0,
                phns_subsequence,
            )

        p_seq_subsequence = self._slice_target_word_probs(
            p_seq_p, target_word_indexes, longest, p_seq_edge,
            self.word_separator,
        )
        return (
            p_seq_subsequence,
            phns_subsequence,
            subsequence_lengths / longest,
        )

    def _get_target_word_indexes(
        self, phns, range_phns, start, word_separator, phn_lens=None
    ):
        """Count separators before ``start`` → zero-based word index
        (reference ``homograph.py:486``)."""
        if phn_lens is not None:
            end_of_sequence = range_phns == (
                phn_lens[:, None] * phns.shape[1]
            ).astype(jnp.int32)
        else:
            end_of_sequence = jnp.zeros_like(range_phns, dtype=bool)
        word_boundaries = (range_phns < start) & (
            (phns == word_separator) | end_of_sequence
        )
        return word_boundaries.sum(axis=-1)

    def _get_word_boundaries(self, tokens, word_indexes, edge):
        """(start, end) positions of word ``word_indexes`` in the
        argmax-decoded sequence (reference ``homograph.py:521``)."""
        words_range = jnp.arange(tokens.shape[-1])[None, :]
        word_boundaries = (tokens == self.word_separator) | (
            words_range == edge
        )
        words = jnp.cumsum(word_boundaries, axis=-1)
        index_match = words == word_indexes[:, None]
        start = self._get_positions(
            index_match, words_range, "min", edge
        )
        end = self._get_positions(index_match, words_range, "max", 0)
        return start, end

    def _get_positions(
        self, index_match, words_range, aggregation, no_match_value
    ):
        positions = jnp.where(index_match, words_range, no_match_value)
        if aggregation == "min":
            positions = jnp.min(positions, axis=-1)
        else:
            positions = jnp.max(positions, axis=-1)
        return jnp.where(positions == 0, 0, positions + 1)

    def _slice_target_word(
        self, phns, target_word_indexes, longest, edge, word_separator
    ):
        word_start, word_end = self._get_word_boundaries(
            phns, target_word_indexes, edge
        )
        sub = _batch_slice(phns, word_start, longest)
        sub_range = jnp.arange(longest)[None, :]
        sub = jnp.where(
            sub_range >= (word_end - word_start)[:, None], 0.0, sub
        )
        lengths = jnp.minimum(word_end - word_start, longest)
        return sub, lengths

    def _slice_target_word_probs(
        self, p_seq, target_word_indexes, longest, edge, word_separator
    ):
        tokens = jnp.argmax(p_seq, axis=-1)
        word_start, word_end = self._get_word_boundaries(
            tokens, target_word_indexes, edge
        )
        sub = _batch_slice_probs(p_seq, word_start, longest)
        sub_range = jnp.arange(longest)[None, :, None]
        return jnp.where(
            sub_range >= (word_end - word_start)[:, None, None], 0.0, sub
        )

    def extract_hyps(
        self, ref_seq, hyps, subsequence_phn_start, use_base=False
    ):
        """Extract the target word from beam-search hypotheses (host
        side; reference ``homograph.py:597``).

        Arguments
        ---------
        ref_seq : array (B, T)
            reference sequence used to locate the target word index.
        hyps : list of list of int
            decoded hypotheses.
        subsequence_phn_start : array (B,)
            target-word start positions in ``ref_seq``.
        use_base : bool
            count separators in the base-token space.
        """
        ref_seq = jnp.asarray(ref_seq)
        range_phns = jnp.arange(ref_seq.shape[1])[None, :]
        sep = (
            self.word_separator_base if use_base else self.word_separator
        )
        target_word_indexes = np.asarray(
            self._get_target_word_indexes(
                ref_seq,
                range_phns,
                jnp.asarray(subsequence_phn_start)[:, None],
                sep,
            )
        )
        result = []
        for item_hyps, word_index in zip(hyps, target_word_indexes):
            separator_indexes = (
                [-1]
                + [
                    idx
                    for idx, phn in enumerate(item_hyps)
                    if phn == self.word_separator
                ]
                + [None]
            )
            if word_index < len(separator_indexes) - 1:
                left = separator_indexes[word_index]
                if left is None:
                    result.append("")
                    continue
                right = separator_indexes[word_index + 1]
                result.append(item_hyps[left + 1 : right])
            else:
                result.append([])
        return result


def _batch_slice(x, starts, length):
    """vmap'd fixed-size dynamic slice over the batch: (B, T) → (B, L)."""
    return jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (length,))
    )(x, starts.astype(jnp.int32))


def _batch_slice_probs(x, starts, length):
    """(B, T, V) → (B, L, V) fixed-size slice per batch row."""
    return jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(
            row, (s, 0), (length, row.shape[-1])
        )
    )(x, starts.astype(jnp.int32))
