"""Pallas TPU kernels: transducer lattice, fused attention pieces."""
