"""Mesh parallelism over ('data', 'particle') device grids.

The reference is strictly single-process/single-device (SURVEY.md S2.3:
no torch.distributed, no NCCL, no multi-GPU anywhere); this package is the
TPU-native scaling layer it lacks: XLA collectives over ICI expressed via
`jax.sharding` + `shard_map`, with the batch and particle axes of the SMC
state sharded across chips.
"""

from .mesh import make_mesh, data_particle_specs
from .dist_resampling import (
    make_distributed_resampler,
    make_distributed_ot_resampler,
    make_distributed_systematic_resampler,
    make_distributed_fused_resampler,
    distributed_resampling_indices,
    distributed_systematic_indices,
    distributed_systematic_resample,
    distributed_systematic_resample_streaming,
    distributed_soft_resample,
)
from .sharded import make_sharded_train_step, shard_batch
from .islands import island_infer

__all__ = [
    "island_infer",
    "make_mesh", "data_particle_specs",
    "make_distributed_resampler",
    "make_distributed_ot_resampler",
    "make_distributed_systematic_resampler",
    "make_distributed_fused_resampler",
    "distributed_resampling_indices",
    "distributed_systematic_indices",
    "distributed_systematic_resample",
    "distributed_systematic_resample_streaming",
    "distributed_soft_resample",
    "make_sharded_train_step", "shard_batch",
]
