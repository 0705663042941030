"""Pallas TPU kernel: fused denoiser ResnetBlock.

One ResnetBlock (reference `src/core/network/layers/attention.py:78-102`)
is two FiLM'd graph-linear Blocks plus a residual add:

    h  = tanh( FiLM( G1 · (x·W1 + b1) ) )
    h2 = tanh(       G2 · (h·W2 + b2)   )
    out = h2 + x                      (dim == dim_out in every shipped config)

Under XLA each of the four dots (two per-node ``gmm`` matmuls, two [N,N]
influence mixes) round-trips the [N,B,F] activation through HBM — ~8 full
activation traversals per block, the dominant HBM traffic of the diffusion
sampling phase.  This kernel runs the whole block for a batch tile inside
VMEM: one read of x, one write of out, weights resident across grid steps.

Mosaic layout rules (same playbook as ``gru_rollout.py``):
* tiles are [N, bt, Fp] with the feature dim PADDED to Fp=256 lanes so the
  influence-mix reshape [N, bt, Fp] → [N, bt·Fp] merges into a 128-multiple
  lane dim (legal), making G·h a single [N,N]×[N, bt·Fp] MXU dot;
* rank-3 dots are unsupported → the per-node x·W matmuls are unrolled over
  the (≤51) nodes as 2D [bt,Fp]·[Fp,Fp] dots;
* the batch tile ``bt`` sits on SUBLANES here (lane dim is Fp), so it may be
  any multiple of 8 — shrink it to fit the 16 MB scoped-VMEM budget.

Zero-padding stays zero through the block: pad weight/bias/scale/shift
columns are zero, so x·W, +b, FiLM (x·(0+1)+0) and tanh(0)=0 all preserve
zeros, and the residual add is exact.

FiLM uses a SCALAR-time [1, 2·Fp] tile (the sampling loop calls the denoiser
with one t for the whole batch, reference `base.py:343-390`); the training
path (per-element t) stays on XLA.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128


def _resnet_kernel(
    x_ref,       # [N, bt, Fp] compute dtype
    film_ref,    # [1, 2·Fp] (scale ‖ shift), zeros when the block has no FiLM
    w1_ref,      # [N, Fp, Fp]
    b1_ref,      # [N, Fp]
    g1_ref,      # [N, N]
    w2_ref,      # [N, Fp, Fp]
    b2_ref,      # [N, Fp]
    g2_ref,      # [N, N]
    out_ref,     # [N, bt, Fp]
    h_scr,       # VMEM [N, bt, Fp] compute dtype
    *,
    num_nodes: int,
    f_pad: int,
    batch_tile: int,
):
    N, Fp, bt = num_nodes, f_pad, batch_tile
    dt = x_ref.dtype
    x = x_ref[...]

    # block1: per-node x·W1 + b1, then one [N,N]×[N, bt·Fp] influence mix
    for n in range(N):
        h_scr[n] = (
            jax.lax.dot_general(
                x[n], w1_ref[n], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b1_ref[n][None, :]
        ).astype(dt)
    h = jax.lax.dot_general(
        g1_ref[...], h_scr[...].reshape(N, bt * Fp), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, bt, Fp)

    # FiLM (scale+1, shift) then tanh (`attention.py:63-75`)
    scale = film_ref[0, :Fp]
    shift = film_ref[0, Fp:]
    h = jnp.tanh(h * (scale[None, None, :] + 1.0) + shift[None, None, :]).astype(dt)

    # block2 (no FiLM)
    for n in range(N):
        h_scr[n] = (
            jax.lax.dot_general(
                h[n], w2_ref[n], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2_ref[n][None, :]
        ).astype(dt)
    h2 = jax.lax.dot_general(
        g2_ref[...], h_scr[...].reshape(N, bt * Fp), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, bt, Fp)

    out_ref[...] = (jnp.tanh(h2) + x.astype(jnp.float32)).astype(dt)


def _pad_last(a: Array, size: int) -> Array:
    pad = size - a.shape[-1]
    if pad == 0:
        return a
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])


def resnet_block_pallas_padded(
    xp: Array,       # [N, B, Fp] PRE-PADDED activations (zero pad columns)
    filmp: Array,    # [1, 2·Fp] pre-padded scale‖shift
    w1p: Array,      # [N, Fp, Fp] pre-padded weights
    b1p: Array,
    g1: Array,
    w2p: Array,
    b2p: Array,
    g2: Array,
    *,
    batch_tile: int = 64,
    interpret: bool = False,
) -> Array:
    """Core fused block on the padded-feature pipeline: [N,B,Fp] → [N,B,Fp]
    with NO HBM pad/slice round-trips (the caller keeps activations padded
    across the whole denoiser mid-section)."""
    N, B, Fp = xp.shape
    assert B % batch_tile == 0, (B, batch_tile)
    assert Fp % LANE == 0

    grid = (B // batch_tile,)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return pl.pallas_call(
        functools.partial(
            _resnet_kernel, num_nodes=N, f_pad=Fp, batch_tile=batch_tile
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, batch_tile, Fp), lambda i: (0, i, 0)),
            const((1, 2 * Fp)),
            const((N, Fp, Fp)),
            const((N, Fp)),
            const((N, N)),
            const((N, Fp, Fp)),
            const((N, Fp)),
            const((N, N)),
        ],
        out_specs=pl.BlockSpec((N, batch_tile, Fp), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, B, Fp), xp.dtype),
        scratch_shapes=[pltpu.VMEM((N, batch_tile, Fp), xp.dtype)],
        interpret=interpret,
    )(xp, filmp, w1p, b1p, g1.astype(xp.dtype), w2p, b2p, g2.astype(xp.dtype))


def pad_film(film: Array, f: int, f_pad: int) -> Array:
    """[1, 2·f] scale‖shift → [1, 2·f_pad] with zero pad halves."""
    return jnp.concatenate(
        [_pad_last(film[:, :f], f_pad), _pad_last(film[:, f:], f_pad)], axis=-1
    )


@functools.partial(
    jax.jit,
    static_argnames=("batch_tile", "interpret", "f_pad"),
)
def resnet_block_pallas(
    x: Array,        # [N, B, F] (node-major activations, compute dtype)
    film: Array,     # [1, 2·F] scalar-time scale‖shift (zeros → identity FiLM)
    w1: Array,       # [N, F, F] per-node-gathered block1 weights
    b1: Array,       # [N, F]
    g1: Array,       # [N, N] row-normalized influence
    w2: Array,
    b2: Array,
    g2: Array,
    *,
    f_pad: int = 256,
    batch_tile: int = 64,
    interpret: bool = False,
) -> Array:
    """Fused ResnetBlock forward: [N,B,F] → [N,B,F] (same dim in/out).

    Convenience wrapper that pads operands per call — the sampling fast path
    uses ``resnet_block_pallas_padded`` + ``prep_resnet_params(..., f_pad=)``
    to keep activations padded across blocks instead.
    """
    N, B, F = x.shape
    assert F <= f_pad and f_pad % LANE == 0
    dt = x.dtype

    xp = _pad_last(x, f_pad)
    filmp = pad_film(film, F, f_pad).astype(dt)
    w1p = _pad_last(jnp.pad(w1, ((0, 0), (0, f_pad - F), (0, 0))), f_pad).astype(dt)
    w2p = _pad_last(jnp.pad(w2, ((0, 0), (0, f_pad - F), (0, 0))), f_pad).astype(dt)
    b1p = _pad_last(b1, f_pad).astype(dt)
    b2p = _pad_last(b2, f_pad).astype(dt)
    out = resnet_block_pallas_padded(
        xp, filmp, w1p, b1p, g1, w2p, b2p, g2,
        batch_tile=batch_tile, interpret=interpret,
    )
    return out[:, :, :F]


def _rect_in_kernel(
    x_ref,       # [N, bt, Fp] mid-section activations (compute dtype)
    r_ref,       # [N, bt, Fp] long-skip activations
    film_ref,    # [1, 2·Fp] (scale ‖ shift) for block1
    w1_ref,      # [N, 2·Fp, Fp] block1 weights (x-half rows 0:Fp, r-half Fp:)
    b1_ref,      # [N, Fp]
    g1_ref,      # [N, N]
    wr_ref,      # [N, 2·Fp, Fp] residual-projection weights (same row split)
    gr_ref,      # [N, N]
    h_out,       # [N, bt, Fp] block1 output (post FiLM + tanh)
    res_out,     # [N, bt, Fp] residual projection
    h_scr,       # VMEM [N, bt, Fp]
    *,
    num_nodes: int,
    f_pad: int,
    batch_tile: int,
):
    """First pass of the RECTANGULAR (2F→F) final ResnetBlock: the long-skip
    concat never materializes — block1 and the graph-linear residual each run
    as two half-weight dots on the separate x/r streams.  One read of x and
    r covers both outputs; the two [N,2Fp,Fp] banks bound the tile at 32."""
    N, Fp, bt = num_nodes, f_pad, batch_tile
    dt = x_ref.dtype
    x = x_ref[...]
    r = r_ref[...]

    def two_dot(w_ref, n):
        return jax.lax.dot_general(
            x[n], w_ref[n, :Fp], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            r[n], w_ref[n, Fp:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for n in range(N):
        h_scr[n] = (two_dot(w1_ref, n) + b1_ref[n][None, :]).astype(dt)
    h = jax.lax.dot_general(
        g1_ref[...], h_scr[...].reshape(N, bt * Fp), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, bt, Fp)
    scale = film_ref[0, :Fp]
    shift = film_ref[0, Fp:]
    h_out[...] = jnp.tanh(
        h * (scale[None, None, :] + 1.0) + shift[None, None, :]
    ).astype(dt)

    for n in range(N):
        h_scr[n] = two_dot(wr_ref, n).astype(dt)
    res_out[...] = jax.lax.dot_general(
        gr_ref[...], h_scr[...].reshape(N, bt * Fp), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, bt, Fp).astype(dt)


def _rect_out_head_kernel(
    h_ref,       # [N, bt, Fp] block1 output
    res_ref,     # [N, bt, Fp] residual projection
    w2_ref,      # [N, Fp, Fp]
    b2_ref,      # [N, Fp]
    g2_ref,      # [N, N]
    wh_ref,      # [N, Fp, Ho] output-head weights
    bh_ref,      # [N, Ho]
    gh_ref,      # [N, N]
    out_ref,     # [N, bt, Ho]
    f_scr,       # VMEM [N, bt, Fp]
    o_scr,       # VMEM [N, bt, Ho]
    *,
    num_nodes: int,
    f_pad: int,
    h_out: int,
    batch_tile: int,
):
    """Second pass: block2 (no FiLM) + residual add + the denoiser's output
    head (`final_glin`, `generator.py:106`) — the final-block output never
    round-trips HBM before the head projection."""
    N, Fp, Ho, bt = num_nodes, f_pad, h_out, batch_tile
    dt = h_ref.dtype
    h = h_ref[...]
    for n in range(N):
        f_scr[n] = (
            jax.lax.dot_general(
                h[n], w2_ref[n], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2_ref[n][None, :]
        ).astype(dt)
    h2 = jax.lax.dot_general(
        g2_ref[...], f_scr[...].reshape(N, bt * Fp), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, bt, Fp)
    o = (jnp.tanh(h2) + res_ref[...].astype(jnp.float32)).astype(dt)
    for n in range(N):
        o_scr[n] = (
            jax.lax.dot_general(
                o[n], wh_ref[n], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bh_ref[n][None, :]
        ).astype(dt)
    out_ref[...] = jax.lax.dot_general(
        gh_ref[...], o_scr[...].reshape(N, bt * Ho), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, bt, Ho).astype(dt)


def final_block_head_pallas_padded(
    xp: Array,       # [N, B, Fp] mid-section activations (zero pad columns)
    rp: Array,       # [N, B, Fp] long-skip activations (zero pad columns)
    filmp: Array,    # [1, 2·Fp] pre-padded scale‖shift
    w1p: Array,      # [N, 2·Fp, Fp]
    b1p: Array,
    g1: Array,
    wrp: Array,      # [N, 2·Fp, Fp]
    gr: Array,
    w2p: Array,      # [N, Fp, Fp]
    b2p: Array,
    g2: Array,
    whp: Array,      # [N, Fp, Ho] output-head weights (padded)
    bhp: Array,      # [N, Ho]
    gh: Array,
    *,
    batch_tile_in: int = 32,
    batch_tile_out: int = 64,
    interpret: bool = False,
) -> Array:
    """Fused rectangular final ResnetBlock (`attention.py:78-102` with
    dim=2F, dim_out=F — the denoiser's long-skip block, `generator.py:103-105`)
    PLUS the output head, on the padded pipeline:

        out = Gh·(o·Wh + bh),  o = tanh(G2·(h·W2+b2)) + Gr·([x‖r]·Wr),
        h = tanh(FiLM(G1·([x‖r]·W1+b1)))

    Two passes.  Pass 1 (block1 + residual projection) reads x and r once
    and emits both h and res; its two [N,2Fp,Fp] banks cap the tile at 32.
    Pass 2 (block2 + add + head) carries only ~4.4 MB of banks and runs at
    tile 64, and the block output feeds the head inside VMEM."""
    N, B, Fp = xp.shape
    Ho = whp.shape[-1]
    assert B % batch_tile_in == 0 and B % batch_tile_out == 0, (
        B, batch_tile_in, batch_tile_out)
    assert Fp % LANE == 0 and Ho % LANE == 0
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    tile = lambda bt, f: pl.BlockSpec((N, bt, f), lambda i: (0, i, 0))
    dt = xp.dtype

    bt1 = batch_tile_in
    h, res = pl.pallas_call(
        functools.partial(
            _rect_in_kernel, num_nodes=N, f_pad=Fp, batch_tile=bt1
        ),
        grid=(B // bt1,),
        in_specs=[
            tile(bt1, Fp), tile(bt1, Fp), const((1, 2 * Fp)),
            const((N, 2 * Fp, Fp)), const((N, Fp)), const((N, N)),
            const((N, 2 * Fp, Fp)), const((N, N)),
        ],
        out_specs=(tile(bt1, Fp), tile(bt1, Fp)),
        out_shape=(
            jax.ShapeDtypeStruct((N, B, Fp), dt),
            jax.ShapeDtypeStruct((N, B, Fp), dt),
        ),
        scratch_shapes=[pltpu.VMEM((N, bt1, Fp), dt)],
        interpret=interpret,
    )(xp, rp, filmp.astype(dt), w1p.astype(dt), b1p.astype(dt), g1.astype(dt),
      wrp.astype(dt), gr.astype(dt))

    bt2 = batch_tile_out
    return pl.pallas_call(
        functools.partial(
            _rect_out_head_kernel, num_nodes=N, f_pad=Fp, h_out=Ho,
            batch_tile=bt2,
        ),
        grid=(B // bt2,),
        in_specs=[
            tile(bt2, Fp), tile(bt2, Fp),
            const((N, Fp, Fp)), const((N, Fp)), const((N, N)),
            const((N, Fp, Ho)), const((N, Ho)), const((N, N)),
        ],
        out_specs=tile(bt2, Ho),
        out_shape=jax.ShapeDtypeStruct((N, B, Ho), dt),
        scratch_shapes=[
            pltpu.VMEM((N, bt2, Fp), dt),
            pltpu.VMEM((N, bt2, Ho), dt),
        ],
        interpret=interpret,
    )(h, res, w2p.astype(dt), b2p.astype(dt), g2.astype(dt),
      whp.astype(dt), bhp.astype(dt), gh.astype(dt))


def influence_of(params_subtree: dict, num_nodes: int):
    """Row-normalized influence matrix of a ``StaticGraphLinear`` subtree —
    identity when the module was built with ``learn_influence=False`` (no
    ``G`` param exists then, `graph_linear.py:113-117`)."""
    from ..graph_linear import l1_normalize_rows

    if "G" in params_subtree:
        return l1_normalize_rows(params_subtree["G"])
    import jax.numpy as jnp_

    return jnp_.eye(num_nodes, dtype=jnp_.float32)


def prep_resnet_params(block_params: dict, node_types: Optional[np.ndarray], num_nodes: int):
    """Gather a flax ``ResnetBlock`` param subtree into kernel operands
    (per-node weight banks, row-normalized Gs).  The FiLM projection
    (``mlp``) is applied OUTSIDE the kernel (it depends on t, not on x)."""
    type_index = (
        np.zeros(num_nodes, dtype=np.int32)
        if node_types is None
        else np.asarray(node_types, dtype=np.int32)
    )
    p1 = block_params["block1"]["proj"]
    p2 = block_params["block2"]["proj"]
    return dict(
        w1=p1["weight"][type_index], b1=p1["bias"][type_index],
        g1=influence_of(p1, num_nodes),
        w2=p2["weight"][type_index], b2=p2["bias"][type_index],
        g2=influence_of(p2, num_nodes),
    )
