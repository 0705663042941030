"""Pallas TPU kernel: one-pass StaticGraphLinear.

``y = G · (x·W + u + b)`` — the graph-structural linear (reference
`src/core/network/layers/graph_structural.py:30-43`) is TWO dots under XLA
(per-node ``gmm``, then the [N,N] influence mix) with a full [N,B,F]
activation round-trip between them.  This kernel runs both in VMEM.

``u`` is the optional hoisted partial product (the diffusion conditioning's
loop-invariant half, see ``models.denoiser.Denoiser.cond_embedding``).

Used for the fused denoiser's input projection and output head
(``denoiser_fused.py``); same [N, bt, F] tiling rules as the other kernels
(feature dims must be 128-multiples — callers pad).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128


def _glin_kernel(x_ref, w_ref, b_ref, g_ref, u_ref, out_ref, h_scr, *,
                 num_nodes: int, batch_tile: int, has_partial: bool):
    N, bt = num_nodes, batch_tile
    dt = x_ref.dtype
    Fo = w_ref.shape[-1]
    x = x_ref[...]
    for n in range(N):
        h = jax.lax.dot_general(
            x[n], w_ref[n], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[n][None, :]
        if has_partial:
            h = h + u_ref[n]
        h_scr[n] = h.astype(dt)
    out_ref[...] = jax.lax.dot_general(
        g_ref[...], h_scr[...].reshape(N, bt * Fo), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, bt, Fo).astype(dt)


def graph_linear_pallas(
    x: Array,             # [N, B, Fin_p]
    w: Array,             # [N, Fin_p, Fout_p] per-node-gathered, padded
    b: Array,             # [N, Fout_p]
    g: Array,             # [N, N] row-normalized
    u: Optional[Array] = None,  # [N, B, Fout_p] partial product to add
    *,
    batch_tile: int = 64,
    interpret: bool = False,
) -> Array:
    N, B, Fi = x.shape
    Fo = w.shape[-1]
    assert Fi % LANE == 0 and Fo % LANE == 0 and B % batch_tile == 0
    has_partial = u is not None
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    tile = lambda f: pl.BlockSpec((N, batch_tile, f), lambda i: (0, i, 0))
    in_specs = [tile(Fi), const((N, Fi, Fo)), const((N, Fo)), const((N, N)),
                tile(Fo) if has_partial else const((N, 8, Fo))]
    if not has_partial:
        u = jnp.zeros((N, 8, Fo), x.dtype)
    return pl.pallas_call(
        functools.partial(_glin_kernel, num_nodes=N, batch_tile=batch_tile,
                          has_partial=has_partial),
        grid=(B // batch_tile,),
        in_specs=in_specs,
        out_specs=tile(Fo),
        out_shape=jax.ShapeDtypeStruct((N, B, Fo), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, batch_tile, Fo), x.dtype)],
        interpret=interpret,
    )(x, w.astype(x.dtype), b.astype(x.dtype), g.astype(x.dtype), u.astype(x.dtype))
