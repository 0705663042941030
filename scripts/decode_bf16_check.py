#!/usr/bin/env python
"""Decode-rollout bf16/merged-gate kernel check (ROADMAP #3) — measures the
metric-space (mm) deviation and speed of ``compute_dtype='bfloat16'``
(which selects the merged-gate kernel) vs the fp32 kernel at bench shapes.

History: a bf16-storage-only variant of the ORIGINAL kernel was
bit-identical to fp32 at equal speed (default-precision f32 dots already
lower to single-pass-bf16 MXU passes; the rollout is issue-latency bound).
The merged-gate kernel trades 0.55 mm mean deviation (bf16 r/z storage)
for 1.08×; it stays opt-in.

    python scripts/decode_bf16_check.py
"""
from __future__ import annotations

import json
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

from skeletondiffusion_tpu.models import AutoEncoder
from skeletondiffusion_tpu.ops.pallas.gru_rollout import decode_rollout
from skeletondiffusion_tpu.skeleton import create_skeleton

OBS, PH, LAT, B = 30, 120, 96, 12800


def main():
    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=OBS, pred_length=PH, if_consider_hip=False,
    )
    N = skeleton.num_nodes
    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=96, decoder_hidden_size=96,
        latent_size=LAT, node_types=skeleton.nodes_type_id,
    )
    params = ae.init(
        jax.random.key(0), jnp.zeros((1, PH, N, 3)), jnp.zeros((1, OBS, N, 3)),
        ph=PH, method=AutoEncoder.autoencode,
    )
    dec = params["params"]["decoder"]

    # realistic inputs: a plausible pose scale and unit-normal latents
    x_last2 = jax.random.normal(jax.random.key(1), (B, 2, N, 3)) * 0.2
    z = jax.random.normal(jax.random.key(2), (B, N, LAT))

    run = {
        dt: jax.jit(lambda x2, zz, dt=dt: decode_rollout(
            dec, skeleton.nodes_type_id, x2, zz, ph=PH, compute_dtype=dt))
        for dt in (None, "bfloat16")
    }

    outs = {}
    for dt, f in run.items():
        o = f(x_last2, z)
        jax.block_until_ready(o)
        outs[dt] = o

    # metric-space deviation (mm), per rollout step
    to_m = jax.jit(skeleton.transform_to_metric_space)
    m32 = np.asarray(to_m(outs[None]))
    m16 = np.asarray(to_m(outs["bfloat16"]))
    d = np.linalg.norm(m32 - m16, axis=-1) * 1000.0  # [B, ph, N] mm
    per_step = d.mean(axis=(0, 2))

    # timing: vary inputs per rep + fetch per rep (tunnel timing rules)
    times = {}
    for dt, f in run.items():
        per = []
        for i in range(4):
            zi = z + jnp.asarray(i + 1, z.dtype) * 1e-6
            jax.block_until_ready(zi)
            t0 = time.perf_counter()
            o = f(x_last2, zi)
            _ = np.asarray(o[0, 0, 0, 0])
            per.append(time.perf_counter() - t0)
        times[dt] = min(per)

    print(json.dumps({
        "batch": B, "ph": PH,
        "mm_mean": round(float(d.mean()), 4),
        "mm_max": round(float(d.max()), 4),
        "mm_mean_step0": round(float(per_step[0]), 4),
        "mm_mean_step119": round(float(per_step[-1]), 4),
        "fp32_s": round(times[None], 4),
        "bf16_s": round(times["bfloat16"], 4),
        "speedup": round(times[None] / times["bfloat16"], 2),
    }, indent=2))


if __name__ == "__main__":
    main()
