"""mm_interleaved_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
end-to-end generative modelling of interleaved image-text sequences.

Re-designed from scratch with the capabilities of OpenGVLab/MM-Interleaved
(reference layout documented in SURVEY.md). The compute path is pure
JAX/XLA with Pallas kernels for the hot ops; parallelism is expressed as
`jax.sharding` partition specs over a device mesh instead of NCCL/DeepSpeed.
"""

__version__ = "0.1.0"
