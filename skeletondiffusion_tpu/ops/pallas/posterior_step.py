"""Pallas TPU kernel: one fused reverse-diffusion posterior update.

For the flagship sampling configuration (pred_x0 objective, clip_denoised,
identity activation, nonisotropic process — reference
`nonisotropic.py:196-210` + `base.py:343-390`) the entire per-step math
after the denoiser is three [N,N] node mixes plus elementwise work:

    x_{t-1} = P1_t·clip(x̂₀,−1,1) + P2_t·x_t + (U·diag(e^{½logΛ_t}))·ε

Under XLA that is ~11 HBM traversals of the [B,N,D] latent tensor per step
(clip, two posterior-mean einsums + add, exp·noise, U einsum, add, plus the
[B,N,D]↔[N,B,F] transposes around the node-major fused denoiser).  This
kernel runs the whole update in VMEM on the node-major PADDED latent layout
the fused denoiser already uses ([N, B, Dp], Dp=128): 3 tensor reads, 1
write, zero transposes.

The three t-dependent matrices are precomputed as [T,N,3N] tables ONCE per
sampling call (``NonisotropicProcess.posterior_step_tables``), with the
noise column block zeroed at t=0 (the reference's t>0 noise mask).

Zero-padding: pad feature columns of x̂₀/x_t/ε stay zero through clip and
the node mixes (they only contract over nodes), so the padded pipeline
invariant holds for the next step's denoiser call.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128


def _posterior_kernel(
    mo_ref,     # [N, bt, Dp] denoiser output x̂₀ (padded, fp32)
    img_ref,    # [N, bt, Dp] current latent x_t
    noise_ref,  # [N, bt, Dp] white noise ε
    m_ref,      # [N, 3N] = [P1 | P2 | U·diag(σ)] for this t
    out_ref,    # [N, bt, Dp]
    *,
    num_nodes: int,
    d_pad: int,
    batch_tile: int,
    clip_denoised: bool,
):
    N, Dp, bt = num_nodes, d_pad, batch_tile
    # the denoiser output may arrive in bf16; the posterior mix runs fp32
    x0 = mo_ref[...].astype(jnp.float32)
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    flat = lambda a: a.reshape(N, bt * Dp)
    acc = jax.lax.dot_general(
        m_ref[:, :N], flat(x0), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += jax.lax.dot_general(
        m_ref[:, N : 2 * N], flat(img_ref[...]), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += jax.lax.dot_general(
        m_ref[:, 2 * N :], flat(noise_ref[...]), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = acc.reshape(N, bt, Dp).astype(out_ref.dtype)


def posterior_step_pallas(
    mo: Array,     # [N, B, Dp] denoiser x̂₀ output (node-major, padded)
    img: Array,    # [N, B, Dp]
    noise: Array,  # [N, B, Dp]
    m_t: Array,    # [N, 3N] step matrix (see posterior_step_tables)
    *,
    clip_denoised: bool = True,
    batch_tile: int = 128,
    interpret: bool = False,
) -> Array:
    N, B, Dp = img.shape
    assert Dp % LANE == 0, Dp
    assert m_t.shape == (N, 3 * N), m_t.shape
    bt = min(batch_tile, B)
    pad = (-B) % bt
    if pad:
        padded = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
        mo, img, noise = padded(mo), padded(img), padded(noise)
    Bp = B + pad

    tile = pl.BlockSpec((N, bt, Dp), lambda i: (0, i, 0))
    out = pl.pallas_call(
        functools.partial(
            _posterior_kernel, num_nodes=N, d_pad=Dp, batch_tile=bt,
            clip_denoised=clip_denoised,
        ),
        grid=(Bp // bt,),
        in_specs=[tile, tile, tile,
                  pl.BlockSpec((N, 3 * N), lambda i: (0, 0))],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((N, Bp, Dp), img.dtype),
        interpret=interpret,
    )(mo, img, noise, m_t.astype(img.dtype))
    return out[:, :B] if pad else out
