"""Mesh/sharding layer: data-parallel batches + optional model-axis tensor
parallelism over a ``jax.sharding.Mesh`` (ICI single-host, DCN multi-host)."""
from .mesh import (
    batch_sharding,
    coordination_barrier,
    create_mesh,
    maybe_initialize_distributed,
    replicate,
    replicated,
    shard_batch,
    shard_batch_global,
    shard_params_model_axis,
)

__all__ = [
    "batch_sharding", "coordination_barrier", "create_mesh",
    "maybe_initialize_distributed", "replicate", "replicated", "shard_batch",
    "shard_batch_global", "shard_params_model_axis",
]
