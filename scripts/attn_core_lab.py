#!/usr/bin/env python
"""Attention-core kernel lab: A/B the production indicator-dot core (v1,
``joint_attention.attention_core_pallas``) against a feature-major
VPU-reduction prototype (v5) at bench shapes.

v1 burns ~2×2.1 GFLOP of MXU per tile on block-indicator matmuls whose
useful fraction is <1% (contraction sparsity dh/K × lane pad H/128); v5 keeps
the real math (~12 Gop/layer) on the VPU with sublane-segment reduces and
broadcasts in a [N, hd, bt] feature-major tile where every slice is
8-sublane aligned.

    python scripts/attn_core_lab.py            # timing on the TPU
    python scripts/attn_core_lab.py --check    # numeric parity (small B)
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, DH, B = 21, 8, 32, 12800
HD = H * DH


def _core_fm_kernel(qkv_ref, out_ref, prod_scr, *, num_nodes, heads, dim_head,
                    batch_tile):
    n_, h_, dh = num_nodes, heads, dim_head
    hd = h_ * dh
    bt = batch_tile
    dt = qkv_ref.dtype
    scale = dh ** -0.5
    for n in range(n_):
        qn = qkv_ref[n, :hd, :] * scale             # [hd, bt]
        prod_scr[...] = qkv_ref[:, hd:2 * hd, :] * qn[None]
        for h in range(h_):
            s = jnp.sum(
                prod_scr[:, h * dh:(h + 1) * dh, :].astype(jnp.float32), axis=1
            )                                        # [n_, bt]
            mx = jnp.max(s, axis=0, keepdims=True)
            e = jnp.exp(s - mx)
            a = (e / jnp.sum(e, axis=0, keepdims=True)).astype(dt)
            seg = qkv_ref[:, 2 * hd + h * dh: 2 * hd + (h + 1) * dh, :] * a[:, None, :]
            out_ref[n, h * dh:(h + 1) * dh, :] = jnp.sum(seg, axis=0).astype(dt)


@functools.partial(jax.jit, static_argnames=("heads", "dim_head", "batch_tile", "interpret"))
def core_fm(qkv, *, heads, dim_head, batch_tile=128, interpret=False):
    n_, hd3, b = qkv.shape
    hd = heads * dim_head
    assert hd3 == 3 * hd
    return pl.pallas_call(
        functools.partial(_core_fm_kernel, num_nodes=n_, heads=heads,
                          dim_head=dim_head, batch_tile=batch_tile),
        grid=(b // batch_tile,),
        in_specs=[pl.BlockSpec((n_, hd3, batch_tile), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((n_, hd, batch_tile), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((n_, hd, b), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((n_, hd, batch_tile), qkv.dtype)],
        interpret=interpret,
    )(qkv)


def ref_core_fm(qkv):
    """XLA reference for the fm layout (fp32 math)."""
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=1)
    # [n, (h,c), b] → sim[b,h,n,m]
    qh = q.reshape(N, H, DH, -1) * DH ** -0.5
    kh = k.reshape(N, H, DH, -1)
    vh = v.reshape(N, H, DH, -1)
    sim = jnp.einsum("nhcb,mhcb->bhnm", qh, kh, precision=jax.lax.Precision.HIGHEST)
    a = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhnm,mhcb->nhcb", a, vh, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(N, HD, -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    key = jax.random.key(0)
    if args.check:
        qkv = jax.random.normal(key, (N, 3 * HD, 128), jnp.float32) * 0.5
        got = core_fm(qkv, heads=H, dim_head=DH, batch_tile=128)
        want = ref_core_fm(qkv)
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        print("core_fm max err:", err)
        assert err < 2e-5, err
        qkv = qkv.astype(jnp.bfloat16)
        got = core_fm(qkv, heads=H, dim_head=DH, batch_tile=128)
        err = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max()
        print("core_fm bf16 max err:", err)
        return

    from skeletondiffusion_tpu.ops.pallas.joint_attention import attention_core_pallas

    dt = jnp.bfloat16
    qkv_bm = jax.random.normal(jax.random.key(0), (N, B, 3 * HD), dt) * 0.5
    qkv_fm = jnp.swapaxes(qkv_bm, 1, 2)
    DEPTH = 8

    # axon-tunnel timing rule: independent enqueues measure dispatch, not
    # compute — only data-DEPENDENT chains inside one jit are trustworthy.
    # The concat feeding step costs both variants the same ~0.7 ms/iter.
    def timeit(name, chain, x):
        # vary the input every rep (the axon runtime caches identical
        # executions) and force a device fetch per rep (block_until_ready
        # alone has returned early under the tunnel) — see SKILL.md
        xs = [x + jnp.asarray(i, x.dtype) * 1e-6 for i in range(5)]
        jax.block_until_ready(xs)
        out = chain(xs[-1]); _ = np.asarray(out[0, 0, 0])
        per = []
        for xi in xs[:4]:
            t0 = time.perf_counter()
            o = chain(xi)
            _ = np.asarray(o[0, 0, 0])
            per.append((time.perf_counter() - t0) / DEPTH * 1e3)
        print(f"{name}: {min(per):.3f} ms/call (incl. ~0.7 ms concat feed)", flush=True)

    @jax.jit
    def chain_v1(x):
        for _ in range(DEPTH):
            o = attention_core_pallas(x, heads=H, dim_head=DH)
            x = jnp.concatenate([o, o, o], axis=-1)
        return x

    @jax.jit
    def chain_v5(x):
        for _ in range(DEPTH):
            o = core_fm(x, heads=H, dim_head=DH, batch_tile=128)
            x = jnp.concatenate([o, o, o], axis=1)
        return x

    timeit("v1 (indicator dots, bm)", chain_v1, qkv_bm)
    timeit("v5 (fm sublane-reduce) bt=128", chain_v5, qkv_fm)


if __name__ == "__main__":
    main()
