#!/usr/bin/env python
"""Stage wall-time breakdown of the headline bench program via nested prefix
programs (embed → +sampling → +decode → +metric transform), each compiled
whole like the real bench — successive differences give per-stage times
without materializing extra intermediates.

    python scripts/bench_breakdown.py
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

import bench  # reuse the bench model builder


def main():
    skeleton, predictor, full = bench.build()
    N = skeleton.num_nodes
    B, S = bench.BATCH, bench.NUM_SAMPLES
    ae, aep = predictor.autoencoder, predictor.ae_params
    diffusion, dp = predictor.diffusion, predictor.diff_params
    from skeletondiffusion_tpu.models.autoencoder import AutoEncoder
    from skeletondiffusion_tpu.ops.pallas.gru_rollout import decode_rollout

    def prefix(depth):
        def f(ae_params, diff_params, rng, obs):
            z_past = ae.apply(ae_params, obs, method=AutoEncoder.get_past_embedding)
            if depth == 1:
                return z_past
            x_cond = jnp.repeat(z_past, S, axis=0)
            latents, _ = diffusion.sample(
                diff_params, rng, batch_size=B * S, x_cond=x_cond)
            if depth == 2:
                return latents
            obs_t = jnp.repeat(obs, S, axis=0)
            pred = decode_rollout(
                ae_params["params"]["decoder"], skeleton.nodes_type_id,
                obs_t[:, -2:], latents, ph=bench.PRED_LEN)
            if depth == 3:
                return pred
            return skeleton.transform_to_metric_space(pred)
        return jax.jit(f)

    obs0 = jax.random.normal(jax.random.key(7), (B, bench.OBS_LEN, N, 3)) * 0.3

    def timeit(f, reps=3):
        o = f(aep, dp, jax.random.key(0), obs0)
        jax.block_until_ready(o)
        per = []
        for i in range(1, reps + 1):
            t0 = time.perf_counter()
            o = f(aep, dp, jax.random.key(i), obs0)
            jax.block_until_ready(o)
            per.append(time.perf_counter() - t0)
        del o
        return min(per)

    t = [timeit(prefix(d)) for d in (1, 2, 3, 4)]
    phase_s = {
        "embed": t[0],
        "sample": t[1] - t[0],
        "decode": t[2] - t[1],
        "metric": t[3] - t[2],
    }

    # Per-phase MFU: analytical useful FLOPs (utils/flops.py) over measured
    # phase wall time, against the v5e bf16 MXU peak.
    from skeletondiffusion_tpu.utils.flops import V5E_BF16_PEAK_FLOPS, prediction_flops

    fl = prediction_flops(
        n=N, obs_len=bench.OBS_LEN, pred_len=bench.PRED_LEN,
        num_samples=S, timesteps=10, latent=bench.LATENT,
    )
    out = {}
    for k, secs in phase_s.items():
        out[f"{k}_s"] = round(secs, 4)
        out[f"{k}_gflops"] = round(B * fl[k] / 1e9, 2)
        out[f"{k}_mfu"] = round(B * fl[k] / max(secs, 1e-9) / V5E_BF16_PEAK_FLOPS, 5)
    out["total_s"] = round(t[3], 4)
    out["total_gflops"] = round(B * fl["total"] / 1e9, 2)
    out["total_mfu"] = round(B * fl["total"] / t[3] / V5E_BF16_PEAK_FLOPS, 5)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
