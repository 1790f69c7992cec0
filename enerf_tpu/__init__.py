"""enerf-tpu: a TPU-native neural radiance field framework for event cameras.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of knelk/enerf
(E-NeRF: instant-ngp-style NeRF trained from a moving event camera), built
TPU-first:

- functional core: parameters, occupancy state and optimizer state are
  explicit pytrees threaded through pure, jit-compiled functions
- hash-grid encoding as a batched gather with autodiff scatter-add (and a
  Pallas fast path), replacing the CUDA atomicAdd kernels
- static-shape ray marching and compositing (lax scans / masks), replacing
  atomic stream-compaction
- multi-chip scaling via jax.sharding Mesh + NamedSharding (rays sharded,
  parameters replicated, gradient psum over ICI), replacing torch DDP/NCCL

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package import)."""
    if name == "Config":
        from enerf_tpu.config import Config
        return Config
    if name == "Trainer":
        from enerf_tpu.train.trainer import Trainer
        return Trainer
    if name == "make_providers":
        from enerf_tpu.data.provider import make_providers
        return make_providers
    raise AttributeError(name)
