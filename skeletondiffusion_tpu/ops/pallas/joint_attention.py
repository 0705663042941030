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
    s_ref,     # [H·dh, Hp] head block-indicator (head axis zero-padded to 128
               # lanes; pad heads yield zero sim → uniform attn → never read)
    st_ref,    # [Hp, H·dh] (pad rows zero → pad attn columns contribute 0)
    out_ref,   # [N, bt, H·dh]
    *,
    num_nodes: int,
    heads: int,
    dim_head: int,
    batch_tile: int,
    heads_pad: int,
):
    N, bt, Hp = num_nodes, batch_tile, heads_pad
    hd = heads * dim_head
    dt = qkv_ref.dtype
    scale = dim_head**-0.5

    q = qkv_ref[:, :, :hd]
    k = qkv_ref[:, :, hd : 2 * hd]
    v = qkv_ref[:, :, 2 * hd :]

    for n in range(N):
        # sim over all m at once: (K ⊙ q[n]) then head-block reduce on MXU
        prod = (k * (q[n] * scale)[None]).reshape(N * bt, hd)
        sim = jax.lax.dot_general(
            prod, s_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, bt, Hp)
        # softmax over the m (joint) axis
        mx = jnp.max(sim, axis=0, keepdims=True)
        e = jnp.exp(sim - mx)
        attn = (e / jnp.sum(e, axis=0, keepdims=True)).astype(dt)
        # AV: expand per-head weights back to feature lanes, multiply, reduce m
        a_exp = jax.lax.dot_general(
            attn.reshape(N * bt, Hp), st_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, bt, hd).astype(dt)
        out_ref[n] = jnp.sum(a_exp * v, axis=0)


@functools.partial(
    jax.jit, static_argnames=("heads", "dim_head", "batch_tile", "interpret")
)
def attention_core_pallas(
    qkv: Array,          # [N, B, 3·H·dh] node-major packed q‖k‖v
    *,
    heads: int,
    dim_head: int,
    batch_tile: int = 64,
    interpret: bool = False,
) -> Array:
    """sim/softmax/AV over the joint axis: [N,B,3·H·dh] → [N,B,H·dh]."""
    N, B, three_hd = qkv.shape
    hd = heads * dim_head
    assert three_hd == 3 * hd, (three_hd, heads, dim_head)
    assert hd % 128 == 0, "head·dim_head must fill 128-lane tiles"
    assert B % batch_tile == 0, (B, batch_tile)
    dt = qkv.dtype

    heads_pad = max(128, heads)
    s = np.zeros((hd, heads_pad), np.float32)
    for h in range(heads):
        s[h * dim_head : (h + 1) * dim_head, h] = 1.0
    s = jnp.asarray(s, dt)

    grid = (B // batch_tile,)
    return pl.pallas_call(
        functools.partial(
            _attn_core_kernel, num_nodes=N, heads=heads,
            dim_head=dim_head, batch_tile=batch_tile, heads_pad=heads_pad,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, batch_tile, 3 * hd), lambda i: (0, i, 0)),
            pl.BlockSpec((hd, heads_pad), lambda i: (0, 0)),
            pl.BlockSpec((heads_pad, hd), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((N, batch_tile, hd), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, B, hd), dt),
        interpret=interpret,
    )(qkv, s, s.T)
