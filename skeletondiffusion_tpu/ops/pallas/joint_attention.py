"""Pallas TPU kernel: fused attention-over-joints core (sim → softmax → AV).

The denoiser attends ACROSS the skeleton's N≈21 joints (reference
`src/core/network/layers/attention.py:122-136`): per (batch, head) the
similarity is a [N,dh]·[dh,N] matmul.  XLA lowers that as ~10⁵ batched tiny
matmuls per layer — measured 17.2 ms of the 23.5 ms/layer attention cost at
batch 12 800 (the surrounding qkv/out graph-linears are ~2–3 ms and MXU-
friendly).  96 % of the whole denoiser forward is these einsums.

This kernel restructures the core around the tile layout instead: with
activations [N, bt, H·dh] (batch rows on sublanes, features on lanes), the
per-head contraction over dh becomes an elementwise product followed by ONE
[N·bt, H·dh]×[H·dh, H] block-indicator matmul per query node — 2·N MXU dots
per tile instead of N²·B tiny ones, softmax as a plain axis-0 reduction, and
AV as an indicator-expanded elementwise accumulate.  Everything stays in
VMEM between sim and the output.

Math (per query node n, all m, b, h at once):
    sim[m,b,h] = Σ_c q[n,b,(h,c)]·k[m,b,(h,c)]     = ((K ⊙ q[n]) reshaped
                 [N·bt, H·dh]) @ S,   S[(h,c), h'] = 1[h=h']
    attn       = softmax over m (axis 0)
    out[n]     = Σ_m (attn[m] @ Sᵀ) ⊙ v[m]

Zero-padding note: callers may pad B; pad rows produce garbage attention
(softmax of zeros) but never touch real rows — outputs are sliced by the
caller.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _attn_core_kernel(
    qkv_ref,   # [N, bt, 3·H·dh] (q ‖ k ‖ v on lanes)
    s_ref,     # [CH·H·dh, Hp] block-indicator: S[j·H·dh + h·dh + c, j·H + h]=1
               # (query-chunked; head axis zero-padded to 128 lanes — pad
               # columns yield zero sim → uniform attn → never read)
    st_ref,    # [Hp, CH·H·dh] transpose (pad rows zero → pad attn drops out)
    out_ref,   # [N, bt, H·dh]
    *,
    num_nodes: int,
    heads: int,
    dim_head: int,
    batch_tile: int,
    heads_pad: int,
    query_chunk: int,
):
    N, bt, Hp = num_nodes, batch_tile, heads_pad
    hd = heads * dim_head
    dt = qkv_ref.dtype
    scale = dim_head**-0.5

    q = qkv_ref[:, :, :hd]
    k = qkv_ref[:, :, hd : 2 * hd]
    v = qkv_ref[:, :, 2 * hd :]

    # process CH query nodes per MXU dot: the indicator matmul output is
    # 128-lane-padded regardless, so packing CH·H useful columns into it
    # divides dot and softmax invocations (and their 16× pad waste) by CH
    ch = query_chunk
    for c0 in range(0, N, ch):
        g = min(ch, N - c0)
        prod = jnp.concatenate(
            [k * (q[c0 + j] * scale)[None] for j in range(g)], axis=-1
        ).reshape(N * bt, g * hd)
        sim = jax.lax.dot_general(
            prod, s_ref[: g * hd, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, bt, Hp)
        # softmax over the m (joint) axis; pad columns are all-zero →
        # uniform attn, and the zero rows of Sᵀ discard them below
        mx = jnp.max(sim, axis=0, keepdims=True)
        e = jnp.exp(sim - mx)
        attn = (e / jnp.sum(e, axis=0, keepdims=True)).astype(dt)
        # AV: expand per-head weights back to feature lanes, multiply, reduce m
        a_exp = jax.lax.dot_general(
            attn.reshape(N * bt, Hp), st_ref[:, : g * hd], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, bt, g * hd).astype(dt)
        for j in range(g):
            out_ref[c0 + j] = jnp.sum(
                a_exp[:, :, j * hd : (j + 1) * hd] * v, axis=0
            )


@functools.partial(
    jax.jit,
    static_argnames=("heads", "dim_head", "batch_tile", "interpret", "query_chunk"),
)
def attention_core_pallas(
    qkv: Array,          # [N, B, 3·H·dh] node-major packed q‖k‖v
    *,
    heads: int,
    dim_head: int,
    batch_tile: int = 64,
    query_chunk: int = 4,
    interpret: bool = False,
) -> Array:
    """sim/softmax/AV over the joint axis: [N,B,3·H·dh] → [N,B,H·dh]."""
    N, B, three_hd = qkv.shape
    hd = heads * dim_head
    assert three_hd == 3 * hd, (three_hd, heads, dim_head)
    assert hd % 128 == 0, "head·dim_head must fill 128-lane tiles"
    assert B % batch_tile == 0, (B, batch_tile)
    dt = qkv.dtype

    heads_pad = max(128, heads * query_chunk)
    assert heads * query_chunk <= heads_pad
    s = np.zeros((query_chunk * hd, heads_pad), np.float32)
    for j in range(query_chunk):
        for h in range(heads):
            s[j * hd + h * dim_head : j * hd + (h + 1) * dim_head, j * heads + h] = 1.0
    s = jnp.asarray(s, dt)

    grid = (B // batch_tile,)
    return pl.pallas_call(
        functools.partial(
            _attn_core_kernel, num_nodes=N, heads=heads,
            dim_head=dim_head, batch_tile=batch_tile, heads_pad=heads_pad,
            query_chunk=query_chunk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, batch_tile, 3 * hd), lambda i: (0, i, 0)),
            pl.BlockSpec((query_chunk * hd, heads_pad), lambda i: (0, 0)),
            pl.BlockSpec((heads_pad, query_chunk * hd), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((N, batch_tile, hd), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, B, hd), dt),
        interpret=interpret,
    )(qkv, s, s.T)
