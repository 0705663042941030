"""Pallas TPU kernels: the attention layer's projection stages.

Together with ``joint_attention.py`` (the sim/softmax/AV core) these fuse the
whole PreNorm(Attention-over-joints)+residual layer (reference
`src/core/network/layers/attention.py:98-136`) into three kernels:

    rms_qkv:     x → RMSNorm → per-node x·W_qkv → G_qkv-mix      (1 kernel)
    core:        qkv → sim → softmax → AV                        (1 kernel)
    outproj_res: core_out → per-node ·W_out → G_out-mix → +x     (1 kernel)

Under XLA each graph-linear is TWO dot boundaries (per-node gmm, then the
[N,N] influence mix) with full [N,B,·] activation round-trips between; the
RMSNorm adds another.  Fusing each stage removes the intermediate HBM
traffic; stages stay separate because the qkv weight bank alone is 8.3 MB
bf16 and an all-in-one kernel would not fit the 16 MB scoped-VMEM budget.

Layout: [N, bt, F] tiles (batch on sublanes), the influence-mix reshape
[N, bt, F] → [N, bt·F] requires F % 128 == 0 — callers run the 256-padded
feature pipeline from ``denoiser_fused.py`` (qkv width 768 = 3·256 ✓).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128


def _rms_qkv_kernel(
    x_ref,      # [N, bt, Fp]
    grms_ref,   # [1, Fp] RMSNorm gain with √dim folded in (pad cols zero)
    wqkv_ref,   # [N, Fp, 3·hd]
    gq_ref,     # [N, N] row-normalized qkv influence
    out_ref,    # [N, bt, 3·hd]
    h_scr,      # VMEM [N, bt, hd] (one q/k/v third at a time)
    *,
    num_nodes: int,
    batch_tile: int,
):
    N, bt = num_nodes, batch_tile
    dt = x_ref.dtype
    hd3 = wqkv_ref.shape[-1]

    x = x_ref[...]
    # RMSNorm over the (lane) feature axis; pad columns are zero on both x
    # and the gain, so they contribute nothing to the norm and stay zero
    sq = jnp.sum(x.astype(jnp.float32) * x.astype(jnp.float32), axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-24))
    h = (x / norm * grms_ref[0][None, None, :]).astype(dt)

    # one q/k/v third at a time (reused scratch keeps the VMEM stack small —
    # the full-width gmix temporaries would bust the 16 MB scoped budget)
    third = hd3 // 3
    for s in range(3):
        lo = s * third
        for n in range(N):
            h_scr[n] = jax.lax.dot_general(
                h[n], wqkv_ref[n, :, lo : lo + third], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
        out_ref[:, :, lo : lo + third] = jax.lax.dot_general(
            gq_ref[...], h_scr[...].reshape(N, bt * third), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, bt, third).astype(dt)


def _outproj_res_kernel(
    a_ref,      # [N, bt, hd] attention core output
    x_ref,      # [N, bt, Fp] residual input
    wout_ref,   # [N, hd, Fp]
    go_ref,     # [N, N]
    out_ref,    # [N, bt, Fp]
    h_scr,      # VMEM [N, bt, Fp]
    *,
    num_nodes: int,
    batch_tile: int,
):
    N, bt = num_nodes, batch_tile
    dt = x_ref.dtype
    Fp = wout_ref.shape[-1]

    a = a_ref[...]
    for n in range(N):
        h_scr[n] = jax.lax.dot_general(
            a[n], wout_ref[n], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)
    mixed = jax.lax.dot_general(
        go_ref[...], h_scr[...].reshape(N, bt * Fp), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, bt, Fp)
    out_ref[...] = (mixed + x_ref[...].astype(jnp.float32)).astype(dt)


def rms_qkv_pallas(
    x: Array,       # [N, B, Fp] padded pipeline activations
    g_rms: Array,   # [1, Fp]
    w_qkv: Array,   # [N, Fp, 3·hd]
    g_qkv: Array,   # [N, N]
    *,
    batch_tile: int = 64,
    interpret: bool = False,
) -> Array:
    N, B, Fp = x.shape
    hd3 = w_qkv.shape[-1]
    assert Fp % LANE == 0 and hd3 % LANE == 0 and B % batch_tile == 0
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return pl.pallas_call(
        functools.partial(_rms_qkv_kernel, num_nodes=N, batch_tile=batch_tile),
        grid=(B // batch_tile,),
        in_specs=[
            pl.BlockSpec((N, batch_tile, Fp), lambda i: (0, i, 0)),
            const((1, Fp)),
            const((N, Fp, hd3)),
            const((N, N)),
        ],
        out_specs=pl.BlockSpec((N, batch_tile, hd3), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, B, hd3), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, batch_tile, hd3 // 3), x.dtype)],
        interpret=interpret,
    )(x, g_rms, w_qkv.astype(x.dtype), g_qkv.astype(x.dtype))


def outproj_res_pallas(
    a: Array,       # [N, B, hd]
    x: Array,       # [N, B, Fp]
    w_out: Array,   # [N, hd, Fp]
    g_out: Array,   # [N, N]
    *,
    batch_tile: int = 64,
    interpret: bool = False,
) -> Array:
    N, B, hd = a.shape
    Fp = x.shape[-1]
    assert Fp % LANE == 0 and hd % LANE == 0 and B % batch_tile == 0
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return pl.pallas_call(
        functools.partial(_outproj_res_kernel, num_nodes=N, batch_tile=batch_tile),
        grid=(B // batch_tile,),
        in_specs=[
            pl.BlockSpec((N, batch_tile, hd), lambda i: (0, i, 0)),
            pl.BlockSpec((N, batch_tile, Fp), lambda i: (0, i, 0)),
            const((N, hd, Fp)),
            const((N, N)),
        ],
        out_specs=pl.BlockSpec((N, batch_tile, Fp), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, B, Fp), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, batch_tile, Fp), x.dtype)],
        interpret=interpret,
    )(a, x, w_out.astype(x.dtype), g_out.astype(x.dtype))
