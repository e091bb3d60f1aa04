"""speechbrain_tpu — a TPU-native speech toolkit (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of SpeechBrain 0.5.13
(reference layer map: SURVEY.md §1) for TPU hardware:

- compute path: jax.numpy / lax / Pallas kernels, jit-compiled, bf16-first
- parallelism: ``jax.sharding.Mesh`` + NamedSharding (data-parallel by
  default, with tp/pp hooks in partition specs), not NCCL/MPI process groups
- data path: host-side dynamic-item pipeline feeding bucketed fixed-shape
  batches so XLA compiles a bounded set of programs

Subpackages mirror the reference's layering (SURVEY.md §2) so users of the
reference find the same concepts in the same places:

- ``utils``       infra: checkpoints, metrics, data pipeline DAG, logging
- ``dataio``      datasets, bucketed batching, samplers, encoders, audio I/O
- ``processing``  DSP: STFT/filterbank frontend, augmentation, beamforming
- ``nnet``        NN primitives: conv/rnn/attention/losses/schedulers
- ``lobes``       model assemblies: CRDNN, ECAPA, Conformer, Transducer...
- ``decoders``    greedy/beam search for CTC, seq2seq, transducer
- ``parallel``    mesh construction, sharding rules, collectives
- ``core``        the Brain training engine (jitted steps + host loop)
"""

__version__ = "0.1.0"

__all__ = [
    "Brain",
    "Stage",
    "create_experiment_directory",
    "parse_arguments",
]


def __getattr__(name):
    # Lazy: importing the core engine pulls in jax; keep bare package
    # import cheap for host-only tooling (manifest prep, WER scoring).
    if name in __all__:
        from speechbrain_tpu import core

        return getattr(core, name)
    raise AttributeError(f"module 'speechbrain_tpu' has no attribute {name}")
