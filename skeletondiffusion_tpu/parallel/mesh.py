"""Device mesh + sharding (the one genuinely new first-class layer vs the
reference, which is single-process single-GPU — SURVEY.md §2.7).

Design (scaling-book recipe): pick a mesh, annotate shardings on the inputs
and params, let XLA/GSPMD insert the collectives.

* ``data`` axis: batch (and the 50-sample fan-out, which lives flattened in
  the batch axis) — gradients are psum'd over ICI automatically when params
  are replicated and batches sharded.
* ``model`` axis: kept available for tensor-parallel layouts.  At this model
  scale (~32M-param denoiser) TP is not needed for memory, but
  ``shard_params_model_axis`` demonstrates a real 2D layout by sharding the
  per-node-type weight banks' output features across the axis.

Multi-host: ``maybe_initialize_distributed`` wires ``jax.distributed`` so
the same code spans DCN-connected hosts.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed():
    """Initialize jax.distributed from standard env vars when present (DCN
    multi-host); harmless no-op single-host."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def coordination_barrier(name: str = "barrier", timeout_s: float = 600.0) -> None:
    """Rendezvous ALL processes through the jax coordination service — a KV
    barrier, NOT a device collective.  No-op single-process.

    Why it exists: the in-collective wait of the runtime's cross-host
    transports is bounded (XLA:CPU's Gloo rendezvous times out after ~30 s;
    TPU barrier timeouts are similarly finite), while first-compile skew
    between processes can be minutes.  A process that reaches the first
    collective of a freshly traced program while a peer is still compiling
    dies inside the collective.  The fix is the standard multihost pattern:
    AOT-compile the program (``jit(f).lower(...).compile()``), rendezvous
    here (coordination-service timeouts are generous and configurable), then
    execute — the collective only ever sees execution skew.
    """
    if jax.process_count() == 1:
        return
    try:  # private namespace — guarded so JAX-internal reorganization degrades
        from jax._src import distributed

        client = distributed.global_state.client
    except (ImportError, AttributeError):
        client = None
    if client is None:
        # No coordination client reachable: fall back to a device collective
        # barrier (all processes must already be past compile to get here, so
        # this only serves the explicit-rendezvous use; skew > transport
        # timeout can still fail, which is the pre-existing behavior).
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"skeldiff/{name}")
        return
    client.wait_at_barrier(f"skeldiff/{name}", timeout_in_ms=int(timeout_s * 1000))


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """(data × model) mesh over the available devices.  ``model_parallel``
    must divide the device count; the data axis gets the rest."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put every array leaf with its batch axis sharded over 'data'.

    Multi-process (DCN) runs delegate to :func:`shard_batch_global` — plain
    ``jax.device_put`` cannot target the other hosts' non-addressable
    devices, so the CLIs' single call site stays correct on one host AND
    across hosts (each process feeds its local batch slice)."""
    if jax.process_count() > 1:
        return shard_batch_global(mesh, tree)
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate every leaf across the mesh; multi-process runs build the
    global array from identical per-process data (device_put cannot address
    remote devices)."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), tree
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_batch_global(mesh: Mesh, tree: Any) -> Any:
    """Multi-process (DCN) variant of :func:`shard_batch`: every process
    passes its LOCAL slice of the batch; returns global arrays whose batch
    axis spans the full 'data' axis across hosts
    (``jax.make_array_from_process_local_data`` — ``jax.device_put`` cannot
    target non-addressable devices).  Single-process it equals
    ``shard_batch``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), tree
    )


def shard_params_model_axis(mesh: Mesh, params: Any, min_size: int = 2**16) -> Any:
    """Tensor-parallel layout: shard large weight tensors' LAST dimension
    (output features) over the 'model' axis where divisible; everything else
    replicated.  With model=1 this degenerates to replication."""
    model_size = mesh.shape["model"]

    def place(x):
        if (
            model_size > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.size >= min_size
            and x.shape[-1] % model_size == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(place, params)
