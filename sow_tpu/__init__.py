"""sow_tpu — TPU-native Sum-of-Weights (SoW) + tensor-train training framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``sow`` codebase (SoW low-rank-growth training, TT-compressed optimizer
states, LLaMA/RoBERTa workloads), built for TPU hardware: SPMD over device
meshes via ``jax.sharding``, functional transforms, static shapes, and Pallas
kernels on the hot paths.
"""

from sow_tpu.tt import TensorTrain

__version__ = "0.1.0"

__all__ = ["TensorTrain", "__version__"]
