"""Pallas TPU kernels: per-layer mono-kernels for the denoiser mid-section.

The three-kernels-per-attention + one-kernel-per-block pipeline
(``denoiser_fused.py``) still pays a full [N,B,·] HBM round-trip at every
kernel boundary — ~31 boundaries per denoiser forward ≈ 12.7 GB of pure
boundary traffic per diffusion step at the bench batch (the 768-wide qkv
tensor alone is 826 MB per layer).  These kernels compose the existing
bodies so each (stage, weights) pair that fits one VMEM bank-set becomes a
single kernel:

    stem_block:     stem graph-linear(+u) → ResnetBlock0       (emits r, x)
    rms_qkv_core:   RMSNorm → qkv graph-linear → sim/softmax/AV core
    outproj_block:  out-projection → +residual → next ResnetBlock

Per-forward kernel count drops 32 → 17 and the qkv tensor never leaves
VMEM.  All math is identical to the single-stage kernels (same dot shapes,
same fp32 accumulation, same zero-pad invariants); parity is pinned by the
whole-forward test `tests/test_pallas_resnet.py::test_fused_denoiser_matches_flax`.

Tile sizes: the fat banks cap the batch tile — qkv bank 8.3 MB bf16 →
bt=32 for rms_qkv_core; 3×[N,Fp,Fp] banks → bt=32 for outproj_block;
stem+block → bt=64.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128


def _block_body(o, film_ref, w1_ref, b1_ref, g1_ref, w2_ref, b2_ref, g2_ref,
                h_scr, *, num_nodes, f_pad, batch_tile):
    """ResnetBlock on a VMEM value ``o`` [N, bt, Fp] → [N, bt, Fp]
    (identical math to ``resnet_block._resnet_kernel``)."""
    N, Fp, bt = num_nodes, f_pad, batch_tile
    dt = o.dtype
    for n in range(N):
        h_scr[n] = (
            jax.lax.dot_general(
                o[n], w1_ref[n], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b1_ref[n][None, :]
        ).astype(dt)
    h = jax.lax.dot_general(
        g1_ref[...], h_scr[...].reshape(N, bt * Fp), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, bt, Fp)
    scale = film_ref[0, :Fp]
    shift = film_ref[0, Fp:]
    h = jnp.tanh(h * (scale[None, None, :] + 1.0) + shift[None, None, :]).astype(dt)
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
    return (jnp.tanh(h2) + o.astype(jnp.float32)).astype(dt)


def _stem_block_kernel(
    x_ref,       # [N, bt, Lp] latent input (lat-padded)
    u_ref,       # [N, bt, Fp] hoisted conditioning partial product
    film_ref,    # [1, 2·Fp] block0 FiLM
    ws_ref,      # [N, Lp, Fp] stem weights
    bs_ref,      # [N, Fp]
    gs_ref,      # [N, N]
    w1_ref, b1_ref, g1_ref, w2_ref, b2_ref, g2_ref,   # block0 banks
    r_out,       # [N, bt, Fp] stem output (the long-skip stream)
    x_out,       # [N, bt, Fp] block0 output
    h_scr,       # VMEM [N, bt, Fp]
    *,
    num_nodes: int,
    f_pad: int,
    batch_tile: int,
):
    N, Fp, bt = num_nodes, f_pad, batch_tile
    dt = x_ref.dtype
    x = x_ref[...]
    for n in range(N):
        h_scr[n] = (
            jax.lax.dot_general(
                x[n], ws_ref[n], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bs_ref[n][None, :]
            + u_ref[n]
        ).astype(dt)
    r = jax.lax.dot_general(
        gs_ref[...], h_scr[...].reshape(N, bt * Fp), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(N, bt, Fp).astype(dt)
    r_out[...] = r
    x_out[...] = _block_body(
        r, film_ref, w1_ref, b1_ref, g1_ref, w2_ref, b2_ref, g2_ref, h_scr,
        num_nodes=N, f_pad=Fp, batch_tile=bt,
    )


def _rms_qkv_core_kernel(
    x_ref,       # [N, bt, Fp]
    grms_ref,    # [1, Fp] RMSNorm gain (√dim folded in, pad cols zero)
    wqkv_ref,    # [N, Fp, 3·hd]
    gq_ref,      # [N, N]
    s_ref,       # [CH·hd, Hp] block-indicator (see joint_attention.py)
    st_ref,      # [Hp, CH·hd]
    out_ref,     # [N, bt, hd] attention core output
    qkv_scr,     # VMEM [N, bt, 3·hd]
    h_scr,       # VMEM [N, bt, hd]
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
    dt = x_ref.dtype
    scale_q = dim_head**-0.5

    # RMSNorm over the feature axis (zero pad cols contribute nothing)
    x = x_ref[...]
    sq = jnp.sum(x.astype(jnp.float32) * x.astype(jnp.float32), axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-24))
    hn = (x / norm * grms_ref[0][None, None, :]).astype(dt)

    # qkv projection one third at a time (scratch reuse keeps VMEM small)
    for s in range(3):
        lo = s * hd
        for n in range(N):
            h_scr[n] = jax.lax.dot_general(
                hn[n], wqkv_ref[n, :, lo : lo + hd], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
        qkv_scr[:, :, lo : lo + hd] = jax.lax.dot_general(
            gq_ref[...], h_scr[...].reshape(N, bt * hd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, bt, hd).astype(dt)

    # attention core (identical flow to joint_attention._attn_core_kernel)
    q = qkv_scr[:, :, :hd]
    k = qkv_scr[:, :, hd : 2 * hd]
    v = qkv_scr[:, :, 2 * hd :]
    ch = query_chunk
    for c0 in range(0, N, ch):
        g = min(ch, N - c0)
        prod = jnp.concatenate(
            [k * (q[c0 + j] * scale_q)[None] for j in range(g)], axis=-1
        ).reshape(N * bt, g * hd)
        sim = jax.lax.dot_general(
            prod, s_ref[: g * hd, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, bt, Hp)
        mx = jnp.max(sim, axis=0, keepdims=True)
        e = jnp.exp(sim - mx)
        attn = (e / jnp.sum(e, axis=0, keepdims=True)).astype(dt)
        a_exp = jax.lax.dot_general(
            attn.reshape(N * bt, Hp), st_ref[:, : g * hd], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, bt, g * hd).astype(dt)
        for j in range(g):
            out_ref[c0 + j] = jnp.sum(
                a_exp[:, :, j * hd : (j + 1) * hd] * v, axis=0
            )


def _outproj_block_kernel(
    a_ref,       # [N, bt, hd] attention core output
    x_ref,       # [N, bt, Fp] pre-attention activations (residual stream)
    film_ref,    # [1, 2·Fp] next block's FiLM
    wout_ref,    # [N, hd, Fp]
    go_ref,      # [N, N]
    w1_ref, b1_ref, g1_ref, w2_ref, b2_ref, g2_ref,   # next block banks
    out_ref,     # [N, bt, Fp]
    h_scr,       # VMEM [N, bt, Fp]
    *,
    num_nodes: int,
    f_pad: int,
    batch_tile: int,
):
    N, Fp, bt = num_nodes, f_pad, batch_tile
    dt = x_ref.dtype
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
    o = (mixed + x_ref[...].astype(jnp.float32)).astype(dt)
    out_ref[...] = _block_body(
        o, film_ref, w1_ref, b1_ref, g1_ref, w2_ref, b2_ref, g2_ref, h_scr,
        num_nodes=N, f_pad=Fp, batch_tile=bt,
    )


def stem_block_pallas(
    x_nm: Array,    # [N, B, Lp]
    u_pad: Array,   # [N, B, Fp]
    filmp: Array,   # [1, 2·Fp]
    stem: dict,     # {w, b, g} (padded banks)
    blk: dict,      # {w1, b1, g1, w2, b2, g2}
    *,
    batch_tile: int = 64,
    interpret: bool = False,
):
    """→ (r [N,B,Fp] stem output, x [N,B,Fp] block0 output)."""
    N, B, Lp = x_nm.shape
    Fp = stem["w"].shape[-1]
    assert B % batch_tile == 0 and Fp % LANE == 0
    dt = x_nm.dtype
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    tile = lambda f: pl.BlockSpec((N, batch_tile, f), lambda i: (0, i, 0))
    return pl.pallas_call(
        functools.partial(
            _stem_block_kernel, num_nodes=N, f_pad=Fp, batch_tile=batch_tile
        ),
        grid=(B // batch_tile,),
        in_specs=[
            tile(Lp), tile(Fp), const((1, 2 * Fp)),
            const((N, Lp, Fp)), const((N, Fp)), const((N, N)),
            const((N, Fp, Fp)), const((N, Fp)), const((N, N)),
            const((N, Fp, Fp)), const((N, Fp)), const((N, N)),
        ],
        out_specs=(tile(Fp), tile(Fp)),
        out_shape=(
            jax.ShapeDtypeStruct((N, B, Fp), dt),
            jax.ShapeDtypeStruct((N, B, Fp), dt),
        ),
        scratch_shapes=[pltpu.VMEM((N, batch_tile, Fp), dt)],
        interpret=interpret,
    )(x_nm, u_pad.astype(dt), filmp.astype(dt),
      stem["w"].astype(dt), stem["b"].astype(dt), stem["g"].astype(dt),
      blk["w1"].astype(dt), blk["b1"].astype(dt), blk["g1"].astype(dt),
      blk["w2"].astype(dt), blk["b2"].astype(dt), blk["g2"].astype(dt))


def rms_qkv_core_pallas(
    x: Array,       # [N, B, Fp]
    g_rms: Array,   # [1, Fp]
    w_qkv: Array,   # [N, Fp, 3·hd]
    g_qkv: Array,   # [N, N]
    *,
    heads: int,
    dim_head: int,
    batch_tile: int = 32,
    query_chunk: int = 4,
    interpret: bool = False,
) -> Array:
    """RMSNorm → qkv graph-linear → attention core: [N,B,Fp] → [N,B,hd]."""
    N, B, Fp = x.shape
    hd = heads * dim_head
    assert w_qkv.shape[-1] == 3 * hd and hd % LANE == 0
    assert B % batch_tile == 0
    dt = x.dtype

    heads_pad = max(LANE, heads * query_chunk)
    s = np.zeros((query_chunk * hd, heads_pad), np.float32)
    for j in range(query_chunk):
        for h in range(heads):
            s[j * hd + h * dim_head : j * hd + (h + 1) * dim_head, j * heads + h] = 1.0
    s = jnp.asarray(s, dt)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    tile = lambda f: pl.BlockSpec((N, batch_tile, f), lambda i: (0, i, 0))
    return pl.pallas_call(
        functools.partial(
            _rms_qkv_core_kernel, num_nodes=N, heads=heads, dim_head=dim_head,
            batch_tile=batch_tile, heads_pad=heads_pad, query_chunk=query_chunk,
        ),
        grid=(B // batch_tile,),
        in_specs=[
            tile(Fp), const((1, Fp)),
            const((N, Fp, 3 * hd)), const((N, N)),
            const((query_chunk * hd, heads_pad)),
            const((heads_pad, query_chunk * hd)),
        ],
        out_specs=tile(hd),
        out_shape=jax.ShapeDtypeStruct((N, B, hd), dt),
        scratch_shapes=[
            pltpu.VMEM((N, batch_tile, 3 * hd), dt),
            pltpu.VMEM((N, batch_tile, hd), dt),
        ],
        interpret=interpret,
    )(x, g_rms.astype(dt), w_qkv.astype(dt), g_qkv.astype(dt), s, s.T)


def outproj_block_pallas(
    a: Array,       # [N, B, hd]
    x: Array,       # [N, B, Fp]
    filmp: Array,   # [1, 2·Fp]
    w_out: Array,   # [N, hd, Fp]
    g_out: Array,   # [N, N]
    blk: dict,      # next block banks {w1, b1, g1, w2, b2, g2}
    *,
    batch_tile: int = 32,
    interpret: bool = False,
) -> Array:
    """out-projection → +residual → next ResnetBlock: → [N,B,Fp]."""
    N, B, hd = a.shape
    Fp = x.shape[-1]
    assert B % batch_tile == 0 and Fp % LANE == 0 and hd % LANE == 0
    dt = x.dtype
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    tile = lambda f: pl.BlockSpec((N, batch_tile, f), lambda i: (0, i, 0))
    return pl.pallas_call(
        functools.partial(
            _outproj_block_kernel, num_nodes=N, f_pad=Fp, batch_tile=batch_tile
        ),
        grid=(B // batch_tile,),
        in_specs=[
            tile(hd), tile(Fp), const((1, 2 * Fp)),
            const((N, hd, Fp)), const((N, N)),
            const((N, Fp, Fp)), const((N, Fp)), const((N, N)),
            const((N, Fp, Fp)), const((N, Fp)), const((N, N)),
        ],
        out_specs=tile(Fp),
        out_shape=jax.ShapeDtypeStruct((N, B, Fp), dt),
        scratch_shapes=[pltpu.VMEM((N, batch_tile, Fp), dt)],
        interpret=interpret,
    )(a, x, filmp.astype(dt),
      w_out.astype(dt), g_out.astype(dt),
      blk["w1"].astype(dt), blk["b1"].astype(dt), blk["g1"].astype(dt),
      blk["w2"].astype(dt), blk["b2"].astype(dt), blk["g2"].astype(dt))
