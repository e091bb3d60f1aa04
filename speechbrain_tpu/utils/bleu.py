"""BLEU score metric (native implementation; sacrebleu unavailable).

Parity target: reference ``utils/bleu.py:28`` (BLEUStats).
"""

import collections
import math

from speechbrain_tpu.utils.metric_stats import MetricStats

__all__ = ["BLEUStats", "corpus_bleu"]


def _ngram_counts(tokens, n):
    return collections.Counter(
        tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    )


def corpus_bleu(hypotheses, references, max_n=4):
    """Corpus-level BLEU with the standard brevity penalty.

    hypotheses: list of token lists; references: list of LISTS of token
    lists (multiple references per segment).

    Example
    -------
    >>> hyp = [["the", "cat", "sat"]]
    >>> ref = [[["the", "cat", "sat"]]]
    >>> round(corpus_bleu(hyp, ref)["BLEU"], 1)
    100.0
    """
    clipped = [0] * max_n
    totals = [0] * max_n
    hyp_len = 0
    ref_len = 0
    for hyp, refs in zip(hypotheses, references):
        hyp_len += len(hyp)
        # closest reference length
        ref_len += min(
            (abs(len(r) - len(hyp)), len(r)) for r in refs
        )[1]
        for n in range(1, max_n + 1):
            hyp_counts = _ngram_counts(hyp, n)
            max_ref = collections.Counter()
            for r in refs:
                for gram, c in _ngram_counts(r, n).items():
                    max_ref[gram] = max(max_ref[gram], c)
            totals[n - 1] += max(len(hyp) - n + 1, 0)
            clipped[n - 1] += sum(
                min(c, max_ref[gram]) for gram, c in hyp_counts.items()
            )
    precisions = [
        (clipped[i] / totals[i]) if totals[i] > 0 else 0.0
        for i in range(max_n)
    ]
    # Effective order: exclude n-gram orders with no possible n-grams
    # (short segments), as standard BLEU implementations do.
    effective = [
        precisions[i] for i in range(max_n) if totals[i] > 0
    ] or [0.0]
    if min(effective) > 0:
        log_avg = sum(math.log(p) for p in effective) / len(effective)
        geo_mean = math.exp(log_avg)
    else:
        geo_mean = 0.0
    bp = (
        1.0
        if hyp_len > ref_len
        else math.exp(1 - ref_len / max(hyp_len, 1))
    )
    return {
        "BLEU": 100.0 * bp * geo_mean,
        "precisions": [100.0 * p for p in precisions],
        "BP": bp,
        "hyp_len": hyp_len,
        "ref_len": ref_len,
    }


class BLEUStats(MetricStats):
    """Accumulate (hyp, refs) pairs; summarize corpus BLEU.

    Example
    -------
    >>> stats = BLEUStats()
    >>> stats.append(ids=["u1"], predict=[["a", "b", "c"]],
    ...              targets=[[["a", "b", "c"]]])
    >>> round(stats.summarize("BLEU"), 1)
    100.0
    """

    def __init__(self, lang="en", merge_words=True):
        self.clear()
        self.merge_words = merge_words

    def clear(self):
        """Reset accumulated statistics."""
        self.ids = []
        self.predicts = []
        self.targets = []
        self.summary = {}

    def append(self, ids, predict, targets):
        """targets: list (per segment) of list of references."""
        self.ids.extend(ids)
        self.predicts.extend(predict)
        self.targets.extend(targets)

    def summarize(self, field=None):
        """Return the requested summary statistic(s)."""
        self.summary = corpus_bleu(self.predicts, self.targets)
        if field is not None:
            return self.summary[field]
        return self.summary

    def write_stats(self, filestream):
        """Write a detailed report to the given stream."""
        if not self.summary:
            self.summarize()
        print(f"BLEU: {self.summary['BLEU']:.2f}", file=filestream)
        print(
            f"Precisions: {self.summary['precisions']}", file=filestream
        )
