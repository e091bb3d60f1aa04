"""Backoff n-gram LM evaluation.

Parity targets: reference ``lm/ngram.py:12`` (BackoffNgramLM), ``:109``
(ngram_evaluation_details), ``:171`` (ngram_perplexity).
"""

import math

from speechbrain_tpu.lm.counting import ngrams_for_evaluation, pad_ends

__all__ = [
    "BackoffNgramLM",
    "ngram_evaluation_details",
    "ngram_perplexity",
]

NEGINFINITY = float("-inf")


class BackoffNgramLM:
    """Query interface over backoff n-gram log10 probabilities.

    Arguments
    ---------
    ngrams : dict
        ngrams[order][context_tuple][token] = log10 prob
    backoffs : dict
        backoffs[ngram_tuple] = log10 backoff weight

    Example
    -------
    >>> ngrams = {1: {(): {'a': -0.5, 'b': -0.7}},
    ...           2: {('a',): {'b': -0.2}}}
    >>> lm = BackoffNgramLM(ngrams, {})
    >>> round(lm.logprob('b', ('a',)), 1)
    -0.2
    >>> round(lm.logprob('a', ('b',)), 1)  # backs off to unigram
    -0.5
    """

    def __init__(self, ngrams, backoffs):
        self.ngrams = ngrams
        self.backoffs = backoffs
        self.top_order = max(ngrams.keys())

    def logprob(self, token, context=tuple()):
        """Token log-probability given the context, with backoff."""
        # Truncate context to the highest order available.
        context = tuple(context)
        if len(context) >= self.top_order:
            context = context[-(self.top_order - 1) :] if self.top_order > 1 else ()
        order = len(context) + 1
        if (
            order in self.ngrams
            and context in self.ngrams[order]
            and token in self.ngrams[order][context]
        ):
            return self.ngrams[order][context][token]
        if not context:
            return NEGINFINITY
        # backoffs are keyed by context order then context tuple
        # (reference lm/ngram.py:103); flat dicts also accepted
        table = self.backoffs.get(len(context), self.backoffs)
        backoff = table.get(context, 0.0) if isinstance(table, dict) else 0.0
        return backoff + self.logprob(token, context[1:])


def ngram_evaluation_details(data, LM):
    """Per-sentence evaluation: list of dicts with neglogprob/num_tokens.

    Example
    -------
    >>> ngrams = {1: {(): {'a': -0.3, '</s>': -0.2, '<s>': -0.1}}}
    >>> lm = BackoffNgramLM(ngrams, {})
    >>> details = ngram_evaluation_details([['a']], lm)
    >>> details[0]['num_tokens']
    2
    """
    details = []
    for sentence in data:
        num_tokens = 0
        neglogprob = 0.0
        padded = list(pad_ends(sentence))
        for token, context in ngrams_for_evaluation(
            padded, LM.top_order, predict_first=False
        ):
            num_tokens += 1
            neglogprob -= LM.logprob(token, context)
        details.append(
            {"num_tokens": num_tokens, "neglogprob": neglogprob}
        )
    return details


def ngram_perplexity(eval_details, logbase=10.0):
    """Corpus perplexity from evaluation details.

    Example
    -------
    >>> details = [{'num_tokens': 2, 'neglogprob': 2.0}]
    >>> ngram_perplexity(details)
    10.0
    """
    exponent = sum(d["neglogprob"] for d in eval_details) / sum(
        d["num_tokens"] for d in eval_details
    )
    return logbase ** exponent
