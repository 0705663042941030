"""Pallas TPU kernel: fused graph-GRU decode rollout.

STATUS: numerically verified in interpret mode (matches the flax decoder to
1e-5); on-TPU compilation currently fails in Mosaic's layout inference
("unsupported shape cast") on the [N,bt,3H]→[N,bt·3H] views used to express
the influence-matrix mix as a single MXU dot.  Lane-preserving layout
redesign (pad H to 128 and keep the mix operand 2D from construction) is the
planned fix; until then the XLA node-major decode path is the default.

The decoder unrolls up to 120 sequential graph-GRU steps with a CONSTANT
input (reference `src/core/network/nn/decoder.py:85-104`).  Under XLA each
step is a chain of dot kernels whose [N,B,H] activations round-trip through
HBM — ~36+ GB of traffic for the AMASS eval shapes.  This kernel runs the
ENTIRE rollout for a batch tile inside VMEM: the hidden state, the evolving
influence matrix G ← l1norm(G + ΔG), the per-node weight banks and the
output head never leave the chip; only the [ph,N,bt,3] pose outputs are
written back.

Layout/grid: grid over batch tiles; per tile
  x-side gate pre-activations c_x = x·W_ih + b_ih  [N, bt, 3H]  (loop
  invariant — computed once by XLA outside the kernel)
  h0 [N, bt, H], W_hh [N, H, 3H], b_hh [N, 3H], G/ΔG [N, N],
  W_fc [N, H, 3→padded], b_fc, G_fc → out [ph, N, bt, 3].
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


def _l1norm_rows(g):
    norm = jnp.clip(jnp.sum(jnp.abs(g), axis=1, keepdims=True), 1e-12, None)
    return g / norm


def _rollout_kernel(
    cx_ref,      # [N, bt, 3H] input-side gates (G-unmixed)
    h0_ref,      # [N, bt, H]
    whh_ref,     # [N, H, 3H]
    bhh_ref,     # [N, 3H]
    g0_ref,      # [N, N] (already row-normalized)
    gadd_ref,    # [N, N]
    wfc_ref,     # [N, H, F_out]
    bfc_ref,     # [N, F_out]
    gfc_ref,     # [N, N] (already row-normalized)
    out_ref,     # [ph, N, bt, F_out]
    h_scr,       # VMEM [N, bt, H]
    g_scr,       # VMEM [N, N]
    *,
    ph: int,
    num_nodes: int,
    hidden: int,
):
    N, H = num_nodes, hidden
    bt = h0_ref.shape[1]
    h_scr[...] = h0_ref[...]
    g_scr[...] = g0_ref[...]

    cx = cx_ref[...]
    whh = whh_ref[...]
    bhh = bhh_ref[...]
    gadd = gadd_ref[...]
    wfc = wfc_ref[...]
    bfc = bfc_ref[...]
    gfc = gfc_ref[...]

    def step(t, _):
        h = h_scr[...]
        g = g_scr[...]

        # per-node h·W_hh (N unrolled MXU dots) + bias
        hw = jnp.stack(
            [
                jax.lax.dot_general(
                    h[n], whh[n], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for n in range(N)
            ],
            axis=0,
        ) + bhh[:, None, :]

        # influence mix on both gate stacks: [N,N] @ [N, bt·3H]
        def gmix(x):
            flat = x.reshape(N, bt * 3 * H)
            return jax.lax.dot_general(
                g, flat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).reshape(N, bt, 3 * H)

        xg = gmix(cx)
        hg = gmix(hw)

        i_r, i_z, i_n = xg[..., :H], xg[..., H : 2 * H], xg[..., 2 * H :]
        h_r, h_z, h_n = hg[..., :H], hg[..., H : 2 * H], hg[..., 2 * H :]
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n_ = jnp.tanh(i_n + r * h_n)
        hy = n_ - n_ * z + z * h

        # output head: per-node fc + constant G_fc mix + tanh
        y = jnp.stack(
            [
                jax.lax.dot_general(
                    hy[n], wfc[n], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for n in range(N)
            ],
            axis=0,
        ) + bfc[:, None, :]
        F_out = y.shape[-1]
        y = jax.lax.dot_general(
            gfc, y.reshape(N, bt * F_out), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, bt, F_out)
        out_ref[t] = jnp.tanh(y)

        h_scr[...] = hy
        g_scr[...] = _l1norm_rows(g + gadd)
        return ()

    jax.lax.fori_loop(0, ph, step, ())


def gru_rollout_pallas(
    cx: Array,        # [N, B, 3H]
    h0: Array,        # [N, B, H]
    w_hh: Array,      # [N, H, 3H]   (type banks pre-gathered per node)
    b_hh: Array,      # [N, 3H]
    g0: Array,        # [N, N] row-normalized initial influence
    g_add: Array,     # [N, N]
    w_fc: Array,      # [N, H, F_out]
    b_fc: Array,      # [N, F_out]
    g_fc: Array,      # [N, N] row-normalized output-head influence
    *,
    ph: int,
    batch_tile: int = 128,
    interpret: bool = False,
) -> Array:
    """Full rollout → [ph, N, B, F_out] (float32)."""
    N, B, threeH = cx.shape
    H = h0.shape[-1]
    F_out = w_fc.shape[-1]
    assert B % batch_tile == 0, (B, batch_tile)
    grid = (B // batch_tile,)

    kernel = functools.partial(_rollout_kernel, ph=ph, num_nodes=N, hidden=H)
    full = lambda i: (0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, batch_tile, threeH), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, batch_tile, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, H, threeH), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, H, F_out), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, F_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ph, N, batch_tile, F_out), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ph, N, B, F_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N, batch_tile, H), jnp.float32),
            pltpu.VMEM((N, N), jnp.float32),
        ],
        interpret=interpret,
    )(cx, h0, w_hh, b_hh, g0, g_add, w_fc, b_fc, g_fc)


def decode_rollout(
    decoder_params: dict,
    node_types: Optional[np.ndarray],
    x_last2: Array,   # [B, 2, N, 3] last two observed poses (input space)
    z: Array,         # [B, N, L] latent
    ph: int,
    *,
    batch_tile: int = 128,
    interpret: bool = False,
) -> Array:
    """Functional fused decode: flax ``Decoder`` params → [B, ph, N, 3].

    Numerically equivalent to ``AutoEncoder.decode`` (GRU arch, 1 layer);
    used by the eval/benchmark path where the decode is forward-only.
    """
    from ..graph_linear import gmm_nm, l1_normalize_rows

    N = x_last2.shape[2]
    type_index = (
        np.zeros(N, dtype=np.int32) if node_types is None
        else np.asarray(node_types, dtype=np.int32)
    )

    p_hid = decoder_params["initial_hidden_h"]
    cell = decoder_params["rollout"]["cell"]
    fc = decoder_params["rollout"]["fc"]

    x_t = jnp.swapaxes(x_last2[:, -1], 0, 1)     # [N,B,3]
    x_t_1 = jnp.swapaxes(x_last2[:, -2], 0, 1)
    z_nm = jnp.swapaxes(z, 0, 1)                 # [N,B,L]

    # initial hidden: G·(cat(x_{T-2}, z)·W + b)
    h0_in = jnp.concatenate([x_t_1, z_nm], axis=-1)
    h0 = gmm_nm(h0_in, p_hid["weight"][type_index]) + p_hid["bias"][type_index][:, None, :]
    h0 = jnp.einsum("nm,mbf->nbf", l1_normalize_rows(p_hid["G"]), h0)

    # loop-invariant input-side gates (G applied inside the kernel per step)
    rec_input = jnp.concatenate([x_t, z_nm], axis=-1)
    cx = gmm_nm(rec_input, cell["weight_ih"][type_index]) + cell["bias_ih"][type_index][:, None, :]

    ys = gru_rollout_pallas(
        cx, h0,
        cell["weight_hh"][type_index], cell["bias_hh"][type_index],
        l1_normalize_rows(decoder_params["G0"]), cell["G_add"],
        fc["weight"][type_index], fc["bias"][type_index],
        l1_normalize_rows(fc["G"]),
        ph=ph, batch_tile=batch_tile, interpret=interpret,
    )  # [ph, N, B, 3]
    return jnp.transpose(ys, (2, 0, 1, 3))
