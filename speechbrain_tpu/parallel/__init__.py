"""Mesh construction and sharding rules (the NCCL/DDP replacement)."""

from speechbrain_tpu.parallel import mesh, sharding  # noqa: F401
