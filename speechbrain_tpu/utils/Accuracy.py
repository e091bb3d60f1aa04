"""Accuracy computation (reference ``utils/Accuracy.py:49``)."""

from speechbrain_tpu.utils.metric_stats import AccuracyStats  # noqa: F401

__all__ = ["AccuracyStats"]
