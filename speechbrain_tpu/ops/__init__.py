"""Custom TPU ops (Pallas kernels + wrappers)."""
