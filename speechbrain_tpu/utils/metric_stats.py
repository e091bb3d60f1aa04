"""Metric accumulation across batches: loss stats, WER/CER, EER, minDCF.

All metrics accumulate per-utterance values on the host (numpy) and
``summarize()`` at stage end — device arrays are converted at append
time so no device memory is pinned between steps.

Parity targets: reference ``utils/metric_stats.py:16,189,317,456,509,576``
and ``utils/Accuracy.py:49``.
"""

import numpy as np

from speechbrain_tpu.utils.data_utils import undo_padding
from speechbrain_tpu.utils.edit_distance import (
    wer_details_for_batch,
    wer_summary,
)

__all__ = [
    "MetricStats",
    "ErrorRateStats",
    "BinaryMetricStats",
    "EER",
    "minDCF",
    "ClassificationStats",
    "AccuracyStats",
]


def _to_numpy(x):
    if hasattr(x, "__array__"):
        return np.asarray(x)
    return x


class MetricStats:
    """Accumulate a scalar metric over utterances; summarize at stage end.

    Arguments
    ---------
    metric : callable
        Called as metric(**kwargs appended) and expected to return a
        per-example array or scalar of scores.

    Example
    -------
    >>> def l1(a, b):
    ...     return np.abs(np.asarray(a) - np.asarray(b)).mean(axis=-1)
    >>> stats = MetricStats(metric=l1)
    >>> stats.append(ids=["u1", "u2"], a=np.array([[1.0], [2.0]]),
    ...              b=np.array([[1.5], [2.0]]))
    >>> stats.summarize("average")
    0.25
    """

    def __init__(self, metric, n_jobs=1):
        self.metric = metric
        self.n_jobs = n_jobs
        self.clear()

    def clear(self):
        """Reset accumulated statistics."""
        self.scores = []
        self.ids = []
        self.summary = {}

    def append(self, ids, *args, **kwargs):
        """Accumulate a batch of ids/predictions/targets."""
        self.ids.extend(ids)
        args = [_to_numpy(a) for a in args]
        kwargs = {k: _to_numpy(v) for k, v in kwargs.items()}
        scores = np.atleast_1d(np.asarray(self.metric(*args, **kwargs)))
        self.scores.extend(scores.tolist())

    def summarize(self, field=None):
        """Return the requested summary statistic(s)."""
        scores = np.asarray(self.scores, dtype=np.float64)
        min_index = int(np.argmin(scores)) if len(scores) else 0
        max_index = int(np.argmax(scores)) if len(scores) else 0
        self.summary = {
            "average": float(scores.mean()) if len(scores) else 0.0,
            "min_score": float(scores[min_index]) if len(scores) else 0.0,
            "min_id": self.ids[min_index] if self.ids else None,
            "max_score": float(scores[max_index]) if len(scores) else 0.0,
            "max_id": self.ids[max_index] if self.ids else None,
        }
        if field is not None:
            return self.summary[field]
        return self.summary

    def write_stats(self, filestream, verbose=False):
        """Write a detailed report to the given stream."""
        if not self.summary:
            self.summarize()
        message = f"Average score: {self.summary['average']}\n"
        message += f"Min error: {self.summary['min_score']} "
        message += f"id: {self.summary['min_id']}\n"
        message += f"Max error: {self.summary['max_score']} "
        message += f"id: {self.summary['max_id']}\n"
        filestream.write(message)
        if verbose:
            print(message)


class ErrorRateStats(MetricStats):
    """WER/CER accumulation with Kaldi-style alignment reporting.

    Arguments
    ---------
    merge_tokens : bool
        Concatenate tokens before scoring (for CER from subwords).
    split_tokens : bool
        Split each token into characters before scoring (CER).
    space_token : str
        Token replaced by a space when merging.

    Example
    -------
    >>> stats = ErrorRateStats()
    >>> stats.append(ids=["u1"], predict=[["the", "cat"]],
    ...              target=[["the", "hat"]])
    >>> stats.summarize("error_rate")
    50.0
    """

    def __init__(self, merge_tokens=False, split_tokens=False, space_token="_"):
        self.clear()
        self.merge_tokens = merge_tokens
        self.split_tokens = split_tokens
        self.space_token = space_token

    def clear(self):
        """Reset accumulated statistics."""
        self.scores = []
        self.ids = []
        self.summary = {}

    def append(
        self,
        ids,
        predict,
        target,
        predict_len=None,
        target_len=None,
        ind2lab=None,
    ):
        """Accumulate a batch of ids/predictions/targets."""
        self.ids.extend(ids)
        if predict_len is not None:
            predict = undo_padding(predict, predict_len)
        if target_len is not None:
            target = undo_padding(target, target_len)
        if ind2lab is not None:
            predict = [ind2lab(p) for p in predict]
            target = [ind2lab(t) for t in target]
        if self.merge_tokens:
            predict = _merge_tokens(predict, self.space_token)
            target = _merge_tokens(target, self.space_token)
        if self.split_tokens:
            predict = _split_tokens(predict)
            target = _split_tokens(target)
        scores = wer_details_for_batch(ids, target, predict, True)
        self.scores.extend(scores)

    def summarize(self, field=None):
        """Return the requested summary statistic(s)."""
        self.summary = wer_summary(self.scores)
        self.summary["error_rate"] = self.summary["WER"]
        if field is not None:
            return self.summary[field]
        return self.summary

    def write_stats(self, filestream):
        """Write a Kaldi-style aligned error report."""
        from speechbrain_tpu.dataio.wer import print_wer_summary, print_alignments

        if not self.summary:
            self.summarize()
        print_wer_summary(self.summary, filestream)
        print_alignments(self.scores, filestream)


def _merge_tokens(sequences, space_token):
    out = []
    for seq in sequences:
        joined = "".join(str(s) for s in seq)
        out.append(joined.replace(space_token, " ").split(" "))
    return out


def _split_tokens(sequences):
    out = []
    for seq in sequences:
        out.append(list("".join(str(s) for s in seq)))
    return out


class AccuracyStats(MetricStats):
    """Masked categorical accuracy over padded (B, T, C) log-probs.

    Example
    -------
    >>> probs = np.log(np.array([[[0.9, 0.1], [0.2, 0.8]]]))
    >>> stats = AccuracyStats()
    >>> stats.append(probs, np.array([[0, 1]]), np.array([1.0]))
    >>> stats.summarize()
    1.0
    """

    def __init__(self):
        self.clear()

    def clear(self):
        """Reset accumulated statistics."""
        self.correct = 0.0
        self.total = 0.0
        self.summary = {}

    def append(self, log_probabilities, targets, length=None):
        """Accumulate a batch of ids/predictions/targets."""
        log_probabilities = _to_numpy(log_probabilities)
        targets = _to_numpy(targets)
        if length is not None:
            length = _to_numpy(length)
            abs_len = np.round(length * targets.shape[1]).astype(np.int64)
            mask = (
                np.arange(targets.shape[1])[None, :] < abs_len[:, None]
            )
        else:
            mask = np.ones(targets.shape[:2], dtype=bool)
        pred = log_probabilities.argmax(-1)
        self.correct += float(((pred == targets) & mask).sum())
        self.total += float(mask.sum())

    def summarize(self, field=None):
        """Return the requested summary statistic(s)."""
        acc = self.correct / max(1.0, self.total)
        self.summary = {"accuracy": acc, "correct": self.correct, "total": self.total}
        if field is not None:
            return self.summary[field]
        return acc


class BinaryMetricStats(MetricStats):
    """Binary classification stats: F-score, precision/recall, EER-style
    threshold metrics over accumulated (score, label) pairs.
    """

    def __init__(self, positive_label=1):
        self.positive_label = positive_label
        self.clear()

    def clear(self):
        """Reset accumulated statistics."""
        self.ids = []
        self.scores = []
        self.labels = []
        self.summary = {}

    def append(self, ids, scores, labels):
        """Accumulate a batch of ids/predictions/targets."""
        self.ids.extend(ids)
        self.scores.extend(np.atleast_1d(_to_numpy(scores)).tolist())
        self.labels.extend(np.atleast_1d(_to_numpy(labels)).tolist())

    def summarize(self, field=None, threshold=None, beta=1, eps=1e-8):
        """Return the requested summary statistic(s)."""
        scores = np.asarray(self.scores, dtype=np.float64)
        labels = np.asarray(self.labels, dtype=np.float64)
        if threshold is None:
            positive_scores = scores[labels == 1]
            negative_scores = scores[labels == 0]
            eer, threshold = EER(positive_scores, negative_scores)
        pred = (scores >= threshold).astype(np.float64)
        true = labels
        TP = float((pred * true).sum())
        TN = float(((1 - pred) * (1 - true)).sum())
        FP = float((pred * (1 - true)).sum())
        FN = float(((1 - pred) * true).sum())
        self.summary = {
            "TP": TP,
            "TN": TN,
            "FP": FP,
            "FN": FN,
            "FAR": FP / (FP + TN + eps),
            "FRR": FN / (TP + FN + eps),
            "DER": (FP + FN) / (TP + TN + eps),
            "threshold": float(threshold),
            "precision": TP / (TP + FP + eps),
            "recall": TP / (TP + FN + eps),
        }
        p, r = self.summary["precision"], self.summary["recall"]
        self.summary["F-score"] = (
            (1.0 + beta ** 2) * p * r / (beta ** 2 * p + r + eps)
        )
        if field is not None:
            return self.summary[field]
        return self.summary


def EER(positive_scores, negative_scores):
    """Equal error rate and its threshold from score distributions.

    Example
    -------
    >>> pos = np.array([0.6, 0.7, 0.8, 0.5])
    >>> neg = np.array([0.4, 0.3, 0.2, 0.1])
    >>> eer, th = EER(pos, neg)
    >>> eer
    0.0
    """
    positive_scores = np.asarray(positive_scores, dtype=np.float64)
    negative_scores = np.asarray(negative_scores, dtype=np.float64)
    thresholds = np.unique(np.concatenate([positive_scores, negative_scores]))
    # interpolate midpoints for a finer sweep (reference :479-481)
    if len(thresholds) > 1:
        mid = (thresholds[:-1] + thresholds[1:]) / 2
        thresholds = np.sort(np.concatenate([thresholds, mid]))
    # reference boundary conventions: FRR counts pos <= t, FAR neg > t
    FRR = np.mean(positive_scores[:, None] <= thresholds[None, :], axis=0)
    FAR = np.mean(negative_scores[:, None] > thresholds[None, :], axis=0)
    idx = np.argmin(np.abs(FAR - FRR))
    eer = float((FAR[idx] + FRR[idx]) / 2)
    return eer, float(thresholds[idx])


def minDCF(
    positive_scores, negative_scores, c_miss=1.0, c_fa=1.0, p_target=0.01
):
    """Minimum of the NIST detection cost function over thresholds.

    Example
    -------
    >>> pos = np.array([0.6, 0.7, 0.8, 0.5])
    >>> neg = np.array([0.4, 0.3, 0.2, 0.1])
    >>> cost, th = minDCF(pos, neg)
    >>> cost
    0.0
    """
    positive_scores = np.asarray(positive_scores, dtype=np.float64)
    negative_scores = np.asarray(negative_scores, dtype=np.float64)
    thresholds = np.unique(np.concatenate([positive_scores, negative_scores]))
    if len(thresholds) > 1:
        mid = (thresholds[:-1] + thresholds[1:]) / 2
        thresholds = np.sort(np.concatenate([thresholds, mid]))
    p_miss = np.mean(positive_scores[:, None] <= thresholds[None, :], axis=0)
    p_fa = np.mean(negative_scores[:, None] > thresholds[None, :], axis=0)
    c_det = c_miss * p_miss * p_target + c_fa * p_fa * (1 - p_target)
    idx = int(np.argmin(c_det))
    # reference returns the RAW minimum cost (no c_def normalization,
    # metric_stats.py:570-573)
    return float(c_det[idx]), float(thresholds[idx])


class ClassificationStats(MetricStats):
    """Per-class / per-key accuracy breakdown (e.g. G2P per word).

    Example
    -------
    >>> stats = ClassificationStats()
    >>> stats.append(ids=["u1", "u2"],
    ...              predictions=["A B", "C"],
    ...              targets=["A B", "D"])
    >>> stats.summarize("accuracy")
    0.5
    """

    def __init__(self):
        self.clear()

    def clear(self):
        """Reset accumulated statistics."""
        self.ids = []
        self.predictions = []
        self.targets = []
        self.categories = []
        self.summary = {}

    def append(self, ids, predictions, targets, categories=None):
        """Accumulate a batch of ids/predictions/targets."""
        self.ids.extend(ids)
        self.predictions.extend(predictions)
        self.targets.extend(targets)
        if categories is not None:
            self.categories.extend(categories)
        else:
            self.categories.extend([None] * len(ids))

    def summarize(self, field=None):
        """Return the requested summary statistic(s)."""
        correct = sum(
            p == t for p, t in zip(self.predictions, self.targets)
        )
        total = len(self.predictions)
        by_category = {}
        for p, t, c in zip(self.predictions, self.targets, self.categories):
            if c is None:
                continue
            cat = by_category.setdefault(c, {"correct": 0, "total": 0})
            cat["total"] += 1
            cat["correct"] += int(p == t)
        self.summary = {
            "accuracy": correct / max(1, total),
            "total": total,
            "correct": correct,
            "by_category": {
                c: v["correct"] / max(1, v["total"])
                for c, v in by_category.items()
            },
        }
        if field is not None:
            return self.summary[field]
        return self.summary

    def write_stats(self, filestream):
        """Write a detailed report to the given stream."""
        if not self.summary:
            self.summarize()
        filestream.write(f"Overall accuracy: {self.summary['accuracy']:.2%}\n")
        for c, acc in self.summary["by_category"].items():
            filestream.write(f"  {c}: {acc:.2%}\n")


def multiprocess_evaluation(metric, predict, target, lengths=None, n_jobs=8):
    """Evaluate ``metric(p, t)`` per utterance in a process/thread pool
    (reference ``utils/metric_stats.py:155``; joblib → stdlib
    concurrent.futures)."""
    from concurrent.futures import ThreadPoolExecutor

    if lengths is not None:
        lengths = np.round(
            np.asarray(lengths) * np.asarray(predict).shape[1]
        ).astype(int)
        predict = [np.asarray(p)[:l] for p, l in zip(predict, lengths)]
        target = [np.asarray(t)[:l] for t, l in zip(target, lengths)]
    with ThreadPoolExecutor(max_workers=n_jobs) as ex:
        return list(ex.map(metric, predict, target))


def sequence_evaluation(metric, predict, target, lengths=None):
    """Evaluate ``metric(p, t)`` per utterance sequentially (reference
    ``utils/metric_stats.py:175``).

    Example
    -------
    >>> sequence_evaluation(lambda p, t: float(abs(p - t).sum()),
    ...                     [np.ones(2)], [np.zeros(2)])
    [2.0]
    """
    if lengths is not None:
        lengths = np.round(
            np.asarray(lengths) * np.asarray(predict).shape[1]
        ).astype(int)
        predict = [np.asarray(p)[:l] for p, l in zip(predict, lengths)]
        target = [np.asarray(t)[:l] for t, l in zip(target, lengths)]
    return [metric(p, t) for p, t in zip(predict, target)]
