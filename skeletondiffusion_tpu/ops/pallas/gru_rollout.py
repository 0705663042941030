"""Pallas TPU kernel: fused graph-GRU decode rollout.

The decoder unrolls up to 120 sequential graph-GRU steps with a CONSTANT
input (reference `src/core/network/nn/decoder.py:85-104`).  Under XLA each
step is a chain of dot kernels whose [N,B,·] activations round-trip through
HBM.  This kernel runs the ENTIRE rollout for a batch tile inside VMEM: the
hidden state, the evolving influence matrix G ← l1norm(G + ΔG), the per-node
weight banks and the output head never leave the chip; only the per-step
[N,8,bt] pose staging (rows 0..2 = x/y/z) is DMA'd back to the [ph,N,8,B]
HBM output, sliced/transposed to [B,ph,N,3] outside the kernel.

Mosaic layout rules shape the design (measured on this toolchain):
* rank-3 ``dot_general`` is unsupported → per-node feature-major
  [Hp,Hp]·[Hp,bt] dots are unrolled over the (≤51) nodes, and the influence
  mix G·gates runs as an [N,N]×[N, Hp·bt] MXU dot — one per gate block
  (r/z/n processed sequentially to fit the 16 MB scoped-VMEM budget);
* reshapes merging the sublane into the lane dim are only legal when the
  lane dim is a multiple of 128 → the hidden/gate/feature dims are
  ZERO-PADDED to 128-lane boundaries (H 96→128, per-gate blocks at
  0/128/256, fc output 3→128).  The padding provably stays zero through the
  recurrence: gates in the pad region are σ(0)=½ and tanh(0)=0, giving
  h_pad' = 0 − 0·½ + ½·0 = 0.
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


def _l1norm_rows(g):
    norm = jnp.clip(jnp.sum(jnp.abs(g), axis=1, keepdims=True), 1e-12, None)
    return g / norm


def _rollout_kernel(
    cx_ref,      # [N, 3·Hp, B] in HBM (tile DMA'd once — single-buffered to
                 # fit the 16 MB VMEM budget), padded, feature-major
    h0_ref,      # [N, Hp, B] in HBM
    whhT_ref,    # [N, 3·Hp, Hp]  (transposed weights: gates = W^T·h)
    bhh_ref,     # [N, 3·Hp]
    g0_ref,      # [N, N] (row-normalized)
    gadd_ref,    # [N, N]
    wfcT_ref,    # [N, Fp, Hp]
    bfc_ref,     # [N, Fp]
    gfc_ref,     # [N, N] (row-normalized)
    out_ref,     # [ph, N, 8, B] in HBM — rows 0..2 are x/y/z, rows 3..7 pad
                 # (8-sublane staging keeps every DMA slice tile-aligned)
    h_scr,       # VMEM [N, Hp, bt]
    g_scr,       # VMEM [N, N]
    hw_scr,      # VMEM [N, Hp, bt] (one gate block at a time)
    y_scr,       # VMEM [N, Fp, bt]
    stage_scr,   # VMEM [N, 8, bt] DMA staging
    cx_scr,      # VMEM [N, 3·Hp, bt]
    r_scr,       # VMEM [N, Hp, bt]
    z_scr,       # VMEM [N, Hp, bt]
    dma_sem,     # DMA semaphore
    *,
    ph: int,
    num_nodes: int,
    hidden_pad: int,
    batch_tile: int,
):
    N, Hp = num_nodes, hidden_pad
    bt = batch_tile
    Fp = wfcT_ref.shape[1]
    tile = pl.program_id(0)
    # dot operand dtype (see wrapper docstring: bf16 here buys VMEM, not
    # speed — default-precision f32 dots are single-pass bf16 anyway).
    # Casts must be IDENTITY in fp32 mode — even a no-op astype materializes
    # a VMEM copy under Mosaic (~3 MB across the unrolled node loops).
    cdt = whhT_ref.dtype
    cast = (lambda v: v.astype(cdt)) if cdt != jnp.float32 else (lambda v: v)

    # tile loads: single-buffered manual DMAs from HBM
    cp_cx = pltpu.make_async_copy(
        cx_ref.at[:, :, pl.ds(tile * bt, bt)], cx_scr, dma_sem
    )
    cp_cx.start()
    cp_cx.wait()
    cp_h = pltpu.make_async_copy(
        h0_ref.at[:, :, pl.ds(tile * bt, bt)], h_scr, dma_sem
    )
    cp_h.start()
    cp_h.wait()
    g_scr[...] = g0_ref[...]

    def step(t, _):
        h = h_scr[...]
        g = g_scr[...]
        gc = cast(g)

        # process one gate block (r, z, n) at a time to keep the VMEM stack
        # small: per-node W_hhᵀ·h dots into scratch, then ONE [N,N]·[N,Hp·bt]
        # influence-mix dot per side.  Operand casts happen PER NODE — a
        # whole-array h.astype(bf16) temp busts the 16 MB VMEM stack.
        def gate_block(gate):
            lo = gate * Hp
            for n in range(N):
                hw_scr[n] = cast(
                    jax.lax.dot_general(
                        whhT_ref[n, lo : lo + Hp, :], cast(h[n]),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + bhh_ref[n, lo : lo + Hp][:, None]
                )
            hg = jax.lax.dot_general(
                gc, hw_scr[...].reshape(N, Hp * bt), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(N, Hp, bt)
            xg = jax.lax.dot_general(
                gc, cx_scr[:, lo : lo + Hp, :].reshape(N, Hp * bt), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(N, Hp, bt)
            return xg, hg

        xr, hr = gate_block(0)
        r_scr[...] = jax.nn.sigmoid(xr + hr)
        xz, hz = gate_block(1)
        z_scr[...] = jax.nn.sigmoid(xz + hz)
        xn, hn = gate_block(2)
        n_ = jnp.tanh(xn + r_scr[...] * hn)
        z = z_scr[...]
        hy = n_ - n_ * z + z * h

        # output head: per-node fc + constant G_fc mix + tanh
        for n in range(N):
            y_scr[n] = cast(
                jax.lax.dot_general(
                    wfcT_ref[n], cast(hy[n]), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bfc_ref[n][:, None]
            )
        y = jax.lax.dot_general(
            cast(gfc_ref[...]), y_scr[...].reshape(N, Fp * bt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, Fp, bt)
        # deferred-wait staging: step t's pose DMA drains behind step t+1's
        # gate/head compute; wait only right before the buffer is rewritten
        @pl.when(t > 0)
        def _wait_prev():
            pltpu.make_async_copy(
                stage_scr, out_ref.at[t - 1, :, :, pl.ds(tile * bt, bt)], dma_sem
            ).wait()

        stage_scr[...] = jnp.tanh(y[:, :8, :])
        pltpu.make_async_copy(
            stage_scr, out_ref.at[t, :, :, pl.ds(tile * bt, bt)], dma_sem
        ).start()

        h_scr[...] = hy
        g_scr[...] = _l1norm_rows(g + gadd_ref[...])
        return ()

    jax.lax.fori_loop(0, ph, step, ())
    pltpu.make_async_copy(
        stage_scr, out_ref.at[ph - 1, :, :, pl.ds(tile * bt, bt)], dma_sem
    ).wait()


def _rollout_kernel_merged(
    cx_ref,      # [N, 3·Hp, B] in HBM, bf16, padded, feature-major
    h0_ref,      # [N, Hp, B] in HBM, f32
    whhT_ref,    # [N, 3·Hp, Hp] bf16
    bhh_ref,     # [N, 3·Hp] f32
    g0_ref,      # [N, N] f32 (row-normalized)
    gadd_ref,    # [N, N] f32
    wfcT_ref,    # [N, 8, Hp] bf16 (rows 0..2 = x/y/z, rest zero)
    bfc_ref,     # [N, 8] f32
    gfc_ref,     # [N, N] f32
    out_ref,     # [ph, N, 8, B] f32 in HBM
    h_scr,       # VMEM f32 [N, Hp, bt]
    g_scr,       # VMEM f32 [N, N]
    hw3_scr,     # VMEM bf16 [N, 3·Hp, bt] — ALL gate pre-mixes at once
    y_scr,       # VMEM f32 [N, 8, bt]
    stage_scr,   # VMEM f32 [N, 8, bt]
    cx_scr,      # VMEM bf16 [N, 3·Hp, bt]
    r_scr,       # VMEM bf16 [N, Hp, bt]
    z_scr,       # VMEM bf16 [N, Hp, bt]
    dma_sem,
    *,
    ph: int,
    num_nodes: int,
    hidden_pad: int,
    batch_tile: int,
):
    """Latency-optimized bf16 variant: ONE [3Hp,Hp]·[Hp,bt] dot per node per
    step (vs three) and an 8-row output head — 90 → 48 MXU issues per step.
    The rollout is issue-latency bound (see wrapper docstring), so fewer,
    larger dots is the lever.  bf16 storage of gates/cx/weights makes the
    wider scratches fit the VMEM budget; h and G carries stay f32, and all
    dots accumulate f32 (operand + r/z gate rounding are the only precision
    changes — 0.55 mm mean metric-space deviation, flat over 120 steps)."""
    N, Hp = num_nodes, hidden_pad
    bt = batch_tile
    tile = pl.program_id(0)
    bf16 = jnp.bfloat16

    cp_cx = pltpu.make_async_copy(
        cx_ref.at[:, :, pl.ds(tile * bt, bt)], cx_scr, dma_sem
    )
    cp_cx.start()
    cp_cx.wait()
    cp_h = pltpu.make_async_copy(
        h0_ref.at[:, :, pl.ds(tile * bt, bt)], h_scr, dma_sem
    )
    cp_h.start()
    cp_h.wait()
    g_scr[...] = g0_ref[...]

    def step(t, _):
        h = h_scr[...]
        g = g_scr[...]
        gc = g.astype(bf16)

        for n in range(N):
            hw3_scr[n] = (
                jax.lax.dot_general(
                    whhT_ref[n], h[n].astype(bf16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bhh_ref[n][:, None]
            ).astype(bf16)

        def mix(gate, src):
            lo = gate * Hp
            return jax.lax.dot_general(
                gc, src[:, lo : lo + Hp, :].reshape(N, Hp * bt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(N, Hp, bt)

        r_scr[...] = jax.nn.sigmoid(mix(0, cx_scr[...]) + mix(0, hw3_scr[...])).astype(bf16)
        z_scr[...] = jax.nn.sigmoid(mix(1, cx_scr[...]) + mix(1, hw3_scr[...])).astype(bf16)
        n_ = jnp.tanh(
            mix(2, cx_scr[...]) + r_scr[...].astype(jnp.float32) * mix(2, hw3_scr[...])
        )
        z = z_scr[...].astype(jnp.float32)
        hy = n_ - n_ * z + z * h

        for n in range(N):
            y_scr[n] = (
                jax.lax.dot_general(
                    wfcT_ref[n], hy[n].astype(bf16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bfc_ref[n][:, None]
            )
        y = jax.lax.dot_general(
            gfc_ref[...], y_scr[...].reshape(N, 8 * bt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, 8, bt)
        # deferred-wait staging (see _rollout_kernel)
        @pl.when(t > 0)
        def _wait_prev():
            pltpu.make_async_copy(
                stage_scr, out_ref.at[t - 1, :, :, pl.ds(tile * bt, bt)], dma_sem
            ).wait()

        stage_scr[...] = jnp.tanh(y)
        pltpu.make_async_copy(
            stage_scr, out_ref.at[t, :, :, pl.ds(tile * bt, bt)], dma_sem
        ).start()

        h_scr[...] = hy
        g_scr[...] = _l1norm_rows(g + gadd_ref[...])
        return ()

    jax.lax.fori_loop(0, ph, step, ())
    pltpu.make_async_copy(
        stage_scr, out_ref.at[ph - 1, :, :, pl.ds(tile * bt, bt)], dma_sem
    ).wait()


def _pad_gates_weight(w: np.ndarray, H: int, Hp: int) -> Array:
    """[N, in, 3H] → [N, in_pad, 3Hp] with each gate block at a 128-aligned
    column offset and zero rows for the padded input dims."""
    N, d_in, _ = w.shape
    in_pad = ((d_in + LANE - 1) // LANE) * LANE
    out = jnp.zeros((N, in_pad, 3 * Hp), w.dtype)
    for gate in range(3):
        out = out.at[:, :d_in, gate * Hp : gate * Hp + H].set(
            w[:, :, gate * H : (gate + 1) * H]
        )
    return out


def _pad_gates_vec(b: Array, H: int, Hp: int) -> Array:
    N = b.shape[0]
    out = jnp.zeros((N, 3 * Hp), b.dtype)
    for gate in range(3):
        out = out.at[:, gate * Hp : gate * Hp + H].set(b[:, gate * H : (gate + 1) * H])
    return out


def gru_rollout_pallas(
    cx: Array,        # [N, B, 3H] input-side gates (unpadded, batch-major)
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
    compute_dtype: Optional[str] = None,
    interpret: bool = False,
) -> Array:
    """Full rollout → [ph, N, B, F_out] (float32).

    The rollout is ISSUE-LATENCY bound (ph × grid sequential step bodies;
    dot throughput is not the limiter — default-precision f32 dots already
    lower to single-pass-bf16 MXU passes, see scripts/decode_bf16_check.py).
    ``compute_dtype='bfloat16'`` therefore selects a merged-gate kernel:
    one [3Hp,Hp]·[Hp,bt] dot per node per step instead of three and an
    8-row output head (90 → 48 MXU issues per step), with the wider bf16
    scratches inside the VMEM budget.  h/G carries and all accumulators
    stay fp32; only per-dot operand rounding and bf16 r/z gate storage
    differ from the fp32 kernel.  Measured at the bench shapes
    (scripts/decode_bf16_check.py): 1.08× (186 → 173 ms) at 0.55 mm mean /
    5.4 mm max metric-space deviation, flat over the 120 steps (no error
    growth).  OPT-IN only — the default eval path keeps the fp32 kernel;
    the deviation exceeds the fused-denoiser bf16 noise floor (~0.1 mm
    mean) for a 1.6% headline gain."""
    N, B, threeH = cx.shape
    H = h0.shape[-1]
    Hp = ((H + LANE - 1) // LANE) * LANE
    F_out = w_fc.shape[-1]
    assert F_out <= 8, "output head is staged through an 8-sublane block"
    merged = compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.bfloat16
    Fp = 8 if merged else LANE
    assert B % batch_tile == 0, (B, batch_tile)
    grid = (B // batch_tile,)
    cdt = jnp.bfloat16 if merged else jnp.float32

    # pad to 128-aligned gate blocks and go feature-major [N, F, B]
    cx_p = jnp.zeros((N, 3 * Hp, B), cx.dtype)
    for gate in range(3):
        cx_p = cx_p.at[:, gate * Hp : gate * Hp + H, :].set(
            jnp.swapaxes(cx[..., gate * H : (gate + 1) * H], 1, 2)
        )
    h0_p = jnp.zeros((N, Hp, B), h0.dtype).at[:, :H, :].set(jnp.swapaxes(h0, 1, 2))
    whhT_p = jnp.swapaxes(_pad_gates_weight(w_hh, H, Hp), 1, 2)  # [N, 3Hp, Hp]
    bhh_p = _pad_gates_vec(b_hh, H, Hp)
    wfcT_p = jnp.zeros((N, Fp, Hp), w_fc.dtype).at[:, :F_out, :H].set(
        jnp.swapaxes(w_fc, 1, 2)
    )
    bfc_p = jnp.zeros((N, Fp), b_fc.dtype).at[:, :F_out].set(b_fc)

    if merged:
        kernel = functools.partial(
            _rollout_kernel_merged, ph=ph, num_nodes=N, hidden_pad=Hp,
            batch_tile=batch_tile,
        )
    else:
        kernel = functools.partial(
            _rollout_kernel, ph=ph, num_nodes=N, hidden_pad=Hp,
            batch_tile=batch_tile,
        )
    full3 = lambda i: (0, 0, 0)
    full2 = lambda i: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((N, 3 * Hp, Hp), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 3 * Hp), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Fp, Hp), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Fp), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), full2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        out_shape=jax.ShapeDtypeStruct((ph, N, 8, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N, Hp, batch_tile), jnp.float32),
            pltpu.VMEM((N, N), jnp.float32),
            pltpu.VMEM(
                (N, 3 * Hp if merged else Hp, batch_tile), cdt
            ),
            pltpu.VMEM((N, Fp, batch_tile), jnp.float32),
            pltpu.VMEM((N, 8, batch_tile), jnp.float32),
            pltpu.VMEM((N, 3 * Hp, batch_tile), cdt),
            pltpu.VMEM((N, Hp, batch_tile), cdt),
            pltpu.VMEM((N, Hp, batch_tile), cdt),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(cx_p.astype(cdt), h0_p, whhT_p.astype(cdt), bhh_p, g0, g_add,
      wfcT_p.astype(cdt), bfc_p, g_fc)
    # [ph, N, 8, B] → [ph, N, B, F_out]
    return jnp.transpose(out[:, :, :F_out, :], (0, 1, 3, 2))


def decode_rollout(
    decoder_params: dict,
    node_types: Optional[np.ndarray],
    x_last2: Array,   # [B, 2, N, 3] last two observed poses (input space)
    z: Array,         # [B, N, L] latent
    ph: int,
    *,
    batch_tile: int = 128,
    compute_dtype: Optional[str] = None,
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
        ph=ph, batch_tile=batch_tile, compute_dtype=compute_dtype,
        interpret=interpret,
    )  # [ph, N, B, 3]
    return jnp.transpose(ys, (2, 0, 1, 3))


def can_use_fused_decode(decoder_params: dict, batch: int, batch_tile: int = 128) -> bool:
    """Trace-time guard: fused rollout needs a GRU decoder, a TPU backend and
    a tile-aligned batch (shapes/backend are static under jit)."""
    try:
        hidden = decoder_params["initial_hidden_h"]["weight"].shape[-1]
        is_gru = decoder_params["rollout"]["cell"]["weight_hh"].shape[-1] == 3 * hidden
    except (KeyError, TypeError):
        return False
    return is_gru and jax.default_backend() == "tpu" and batch % batch_tile == 0
