"""Fused-forward denoiser for the sampling path: flax param tree in, Pallas
ResnetBlock kernels for the 2·depth main blocks, functional pad-aware
attention in between.

Functional mirror of ``models.denoiser.Denoiser.__call__`` on its hoisted-
conditioning fast path (``u_cond``; reference call chain
`src/core/diffusion/base.py:243-255` → `nn/generator.py:80-107`) — the shape
of the computation is identical, only the execution strategy changes:

* activations stay PADDED to Fp=256 features across the whole mid-section
  (pad once after the input projection, slice once before the long skip) so
  the per-block kernels do zero HBM pad/slice round-trips;
* attention runs on the padded layout with zero-padded qkv/out weight banks
  (zeros in, zeros out — the pad columns never contaminate real features);
* all weight-side operands (node gathers, pads, casts, row-normalized Gs)
  are precomputed ONCE per sampling call by ``prep_fused_denoiser`` — the
  engine's ``cond_embed`` hook runs it before the scan, so none of it
  re-executes per diffusion step.

Eval/sampling only: scalar time, forward-only, no self-conditioning.
Parity: ``tests/test_pallas_resnet.py::test_fused_denoiser_matches_flax``
pins this forward to ``Denoiser.apply`` in interpret mode.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..attention import sinusoidal_pos_emb
from .resnet_block import (
    _pad_last,
    influence_of,
    final_block_head_pallas_padded,
    pad_film,
    prep_resnet_params,
    resnet_block_pallas_padded,
)

Array = jnp.ndarray


def _type_index(den) -> np.ndarray:
    return (
        np.zeros(den.channels, dtype=np.int32)
        if den.node_types is None
        else np.asarray(den.node_types, dtype=np.int32)
    )


def prep_fused_denoiser(den, variables: dict, f_pad: int = 256) -> dict:
    """Precompute every weight-side operand of the fused forward (runs once
    per sampling call, before the diffusion scan)."""
    p = variables["params"]
    N = den.channels
    F = den.dim + den.cond_dim
    assert F <= f_pad
    cdt = jnp.dtype(den.compute_dtype) if den.compute_dtype else jnp.float32
    idx = _type_index(den)

    blocks = []
    for i in range(2 * den.depth):
        bp = p[f"res{i}"]
        ops = prep_resnet_params(bp, den.node_types, N)
        blocks.append(dict(
            w1=_pad_last(jnp.pad(ops["w1"], ((0, 0), (0, f_pad - F), (0, 0))), f_pad).astype(cdt),
            b1=_pad_last(ops["b1"], f_pad).astype(cdt),
            g1=ops["g1"].astype(cdt),
            w2=_pad_last(jnp.pad(ops["w2"], ((0, 0), (0, f_pad - F), (0, 0))), f_pad).astype(cdt),
            b2=_pad_last(ops["b2"], f_pad).astype(cdt),
            g2=ops["g2"].astype(cdt),
            film_k=bp["mlp"]["kernel"],
            film_b=bp["mlp"]["bias"],
        ))

    # input projection (latent half of init_lin; the conditioning half is the
    # hoisted u_cond) and the output head as one-pass graph-linear kernels
    il = p["init_lin"]
    w_init = il["weight"][idx][:, den.cond_dim : den.cond_dim + den.dim, :]
    w_init = _pad_last(jnp.pad(w_init, ((0, 0), (0, 128 - den.dim % 128 if den.dim % 128 else 0), (0, 0))), f_pad)
    stem = dict(
        w=w_init.astype(cdt),
        b=_pad_last(il["bias"][idx], f_pad).astype(cdt),
        g=influence_of(il, N).astype(cdt),
    )
    fg = p["final_glin"]
    head = dict(
        w=_pad_last(jnp.pad(fg["weight"][idx], ((0, 0), (0, f_pad - F), (0, 0))), 128).astype(cdt),
        b=_pad_last(fg["bias"][idx], 128).astype(cdt),
        g=influence_of(fg, N).astype(cdt),
    )

    # rectangular final block (2F→F, `generator.py:103-105`): block1 and the
    # res_linear projection keep their x-/r-half rows separately padded so
    # the kernel can consume the UNCONCATENATED x and skip streams
    fb = p["final_res_block"]

    def _rect_w(w):  # [N, 2F, F] → [N, 2·f_pad, f_pad], zero pad rows/cols
        halves = [
            jnp.pad(w[:, :F, :], ((0, 0), (0, f_pad - F), (0, 0))),
            jnp.pad(w[:, F:, :], ((0, 0), (0, f_pad - F), (0, 0))),
        ]
        return _pad_last(jnp.concatenate(halves, axis=1), f_pad).astype(cdt)

    fb1 = fb["block1"]["proj"]
    fb2 = fb["block2"]["proj"]
    fbr = fb["res_linear"]
    final = dict(
        w1=_rect_w(fb1["weight"][idx]),
        b1=_pad_last(fb1["bias"][idx], f_pad).astype(cdt),
        g1=influence_of(fb1, N).astype(cdt),
        wr=_rect_w(fbr["weight"][idx]),
        gr=influence_of(fbr, N).astype(cdt),
        w2=_pad_last(jnp.pad(fb2["weight"][idx], ((0, 0), (0, f_pad - F), (0, 0))), f_pad).astype(cdt),
        b2=_pad_last(fb2["bias"][idx], f_pad).astype(cdt),
        g2=influence_of(fb2, N).astype(cdt),
        film_k=fb["mlp"]["kernel"],
        film_b=fb["mlp"]["bias"],
    )

    attns = []
    for i in range(2 * den.depth - 1):
        ap = p[f"attn{i}"]
        a = ap["attn"]
        # RMSNorm gain with the √dim factor folded in; pad cols are zero so
        # the normalized pad features stay zero
        g_rms = _pad_last(ap["norm"]["g"].reshape(1, 1, F) * (F ** 0.5), f_pad)
        attns.append(dict(
            g_rms=g_rms.astype(cdt),
            w_qkv=jnp.pad(
                a["to_qkv"]["weight"][idx], ((0, 0), (0, f_pad - F), (0, 0))
            ).astype(cdt),
            g_qkv=influence_of(a["to_qkv"], N).astype(cdt),
            w_out=_pad_last(a["to_out"]["weight"][idx], f_pad).astype(cdt),
            g_out=influence_of(a["to_out"], N).astype(cdt),
        ))
    return {"blocks": blocks, "attns": attns, "stem": stem, "head": head,
            "final": final}


def _attention_padded(
    aops: dict, x: Array, heads: int, dim_head: int,
    batch_tile: int = 64, interpret: bool = False,
) -> Array:
    """PreNorm(Attention-over-joints) + residual on the padded layout;
    mirrors ``ops.attention.PreNormAttentionResidual`` (node-major branch)
    as three Pallas kernels: norm+qkv projection, the sim/softmax/AV core
    (17 ms → the dominant denoiser cost under XLA; ``joint_attention.py``),
    and out-projection+residual (``attention_proj.py``)."""
    from .attention_proj import outproj_res_pallas, rms_qkv_pallas
    from .joint_attention import attention_core_pallas

    qkv = rms_qkv_pallas(
        x, aops["g_rms"].reshape(1, -1), aops["w_qkv"], aops["g_qkv"],
        batch_tile=batch_tile, interpret=interpret,
    )
    out = attention_core_pallas(
        qkv, heads=heads, dim_head=dim_head,
        batch_tile=batch_tile, interpret=interpret,
    )
    return outproj_res_pallas(
        out, x, aops["w_out"], aops["g_out"],
        batch_tile=batch_tile, interpret=interpret,
    )


def fused_denoiser_apply(
    den,                 # models.denoiser.Denoiser module (config source)
    variables: dict,
    x: Array,            # [B, N, L]
    time: Array,         # scalar int
    u_cond: Array,       # [N, B, F] hoisted conditioning product
    *,
    prepped: Optional[dict] = None,
    f_pad: int = 256,
    batch_tile: int = 64,
    interpret: bool = False,
) -> Array:
    lat_pad = -(-den.dim // 128) * 128
    x_nm = _pad_last(jnp.swapaxes(x, 0, 1), lat_pad)
    u_pad = _pad_last(u_cond, f_pad)
    out = fused_denoiser_core_nm(
        den, variables, x_nm, time, u_pad,
        prepped=prepped, f_pad=f_pad, batch_tile=batch_tile, interpret=interpret,
    )
    return jnp.swapaxes(out[:, :, : den.out_dim], 0, 1).astype(jnp.float32)


def fused_denoiser_core_nm(
    den,                 # models.denoiser.Denoiser module (config source)
    variables: dict,
    x_nm: Array,         # [N, B, lat_pad] node-major latents, zero pad cols
    time: Array,         # scalar int
    u_pad: Array,        # [N, B, f_pad] hoisted conditioning, zero pad cols
    *,
    prepped: Optional[dict] = None,
    f_pad: int = 256,
    batch_tile: int = 64,
    interpret: bool = False,
) -> Array:
    """Node-major core: the whole denoiser on the PADDED pipeline with no
    entry/exit transposes — the sampling scan carries [N, B, Dp] latents
    (see ``diffusion.engine.p_sample_loop``'s fused branch) so this returns
    the head output still node-major and column-padded to 128
    ([N, B, 128], compute dtype, zero pad cols)."""
    p = variables["params"]
    N = den.channels
    diffusion_size = den.dim + den.cond_dim
    cdt = jnp.dtype(den.compute_dtype) if den.compute_dtype else jnp.float32
    if prepped is None:
        prepped = prep_fused_denoiser(den, variables, f_pad=f_pad)

    # pad the batch to a tile multiple (static under jit; last eval batches
    # may be ragged)
    B0 = x_nm.shape[1]
    Bp = -(-B0 // batch_tile) * batch_tile
    if Bp != B0:
        x_nm = jnp.pad(x_nm, ((0, 0), (0, Bp - B0), (0, 0)))
        u_pad = jnp.pad(u_pad, ((0, 0), (0, Bp - B0), (0, 0)))

    # time embedding MLP (scalar t → [1, time_dim])
    time = jnp.atleast_1d(jnp.asarray(time))
    t = sinusoidal_pos_emb(time, diffusion_size, den.sinusoidal_pos_emb_theta)
    t = t @ p["time_mlp0"]["kernel"] + p["time_mlp0"]["bias"]
    t = jax.nn.gelu(t, approximate=False)
    t = t @ p["time_mlp1"]["kernel"] + p["time_mlp1"]["bias"]
    tt = jnp.tanh(t)

    def filmp_for(blk):
        film = tt @ blk["film_k"] + blk["film_b"]  # [1, 2F]
        return pad_film(film, diffusion_size, f_pad).astype(cdt)

    n_pairs = 2 * den.depth
    assert den.use_attention, "fused path expects attention pairs"

    if os.environ.get("SKELDIFF_LAYER_FUSED", "0") == "1":
        # per-layer mono-kernels (layer_fused.py): [stem+block0], then
        # [rms_qkv+core] / [outproj+residual+block_{i+1}] per attention pair
        # — halves the kernel-boundary HBM traffic and the 768-wide qkv
        # tensor never leaves VMEM.  Measured NEUTRAL at the bench batch
        # (314.3 vs 314.3-319.7 preds/s over several runs): Mosaic already
        # overlaps the boundary DMAs with compute via double-buffered grid
        # tiles, so the saved traffic was not on the critical path.  Kept
        # opt-in for smaller-batch regimes where boundary latency shows.
        from .layer_fused import (
            outproj_block_pallas,
            rms_qkv_core_pallas,
            stem_block_pallas,
        )

        rp, xp = stem_block_pallas(
            x_nm.astype(cdt), u_pad, filmp_for(prepped["blocks"][0]),
            prepped["stem"], prepped["blocks"][0],
            batch_tile=batch_tile, interpret=interpret,
        )
        for i in range(n_pairs - 1):
            aops = prepped["attns"][i]
            a = rms_qkv_core_pallas(
                xp, aops["g_rms"].reshape(1, -1), aops["w_qkv"], aops["g_qkv"],
                heads=den.attn_heads, dim_head=den.attn_dim_head,
                # query_chunk=2 halves the core's per-chunk prod temp so the
                # 8.3 MB qkv bank still fits at tile 64 (MXU rows beat the
                # extra softmax invocations — measured)
                batch_tile=batch_tile, query_chunk=2, interpret=interpret,
            )
            xp = outproj_block_pallas(
                a, xp, filmp_for(prepped["blocks"][i + 1]),
                aops["w_out"], aops["g_out"], prepped["blocks"][i + 1],
                batch_tile=batch_tile, interpret=interpret,
            )
    else:
        # single-stage kernel pipeline (kept for A/B and as the reference
        # for the mono-kernels' parity)
        from .graph_linear_fused import graph_linear_pallas

        xp = graph_linear_pallas(
            x_nm.astype(cdt), prepped["stem"]["w"], prepped["stem"]["b"],
            prepped["stem"]["g"],
            u=u_pad.astype(cdt), batch_tile=batch_tile, interpret=interpret,
        )  # [N, Bp, f_pad], pad cols zero
        rp = xp  # long-skip stream stays on the padded pipeline
        for i in range(n_pairs):
            blk = prepped["blocks"][i]
            xp = resnet_block_pallas_padded(
                xp, filmp_for(blk), blk["w1"], blk["b1"], blk["g1"],
                blk["w2"], blk["b2"], blk["g2"],
                batch_tile=batch_tile, interpret=interpret,
            )
            if i != n_pairs - 1:
                xp = _attention_padded(
                    prepped["attns"][i], xp, den.attn_heads, den.attn_dim_head,
                    batch_tile=batch_tile, interpret=interpret,
                )
    # rectangular final block (2F→F long-skip ResnetBlock) + output head,
    # fused on the padded pipeline — neither the x‖r concat nor the block
    # output ever hits HBM (resnet_block.py::final_block_head_pallas_padded)
    fbl = prepped["final"]
    film_f = tt @ fbl["film_k"] + fbl["film_b"]  # [1, 2F]
    filmp_f = pad_film(film_f, diffusion_size, f_pad).astype(cdt)
    out = final_block_head_pallas_padded(
        xp, rp, filmp_f, fbl["w1"], fbl["b1"], fbl["g1"],
        fbl["wr"], fbl["gr"], fbl["w2"], fbl["b2"], fbl["g2"],
        prepped["head"]["w"], prepped["head"]["b"], prepped["head"]["g"],
        batch_tile_in=min(batch_tile, 32), batch_tile_out=batch_tile,
        interpret=interpret,
    )  # [N, Bp, 128], zero pad cols
    return out[:, :B0] if Bp != B0 else out
