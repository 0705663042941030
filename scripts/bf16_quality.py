#!/usr/bin/env python
"""bf16-vs-fp32 stage-2 training quality comparison (ROADMAP #4).

Trains the full-architecture diffusion stage (latent 96, depth 4, batch 64,
k=50 input-space argmin, T=10 — the reference's headline config,
`configs/config_train_diffusion/model/skeleton_diffusion.yaml`) twice from
identical seeds — fp32 network compute vs ``compute_dtype=bfloat16`` — on
synthetic AMASS-shaped data, and reports the per-step loss divergence and
step times.  The decision input for making bf16 the training default.

    python scripts/bf16_quality.py --steps 150 --batch 64 --k 50
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def run(compute_dtype, steps, batch, k, obs_len=30, pred_len=120, latent=96, seed=0):
    import jax
    import jax.numpy as jnp

    from skeletondiffusion_tpu.diffusion.manager import create_diffusion
    from skeletondiffusion_tpu.models import AutoEncoder
    from skeletondiffusion_tpu.skeleton import create_skeleton
    from skeletondiffusion_tpu.train.trainer_diffusion import TrainerDiffusion

    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=obs_len, pred_length=pred_len,
        if_consider_hip=False,
    )
    N = skeleton.num_nodes
    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=96, decoder_hidden_size=96, latent_size=latent,
        node_types=skeleton.nodes_type_id, compute_dtype=compute_dtype,
    )
    ae_params = ae.init(
        jax.random.key(seed), jnp.zeros((1, pred_len, N, 3)), jnp.zeros((1, obs_len, N, 3)),
        ph=pred_len, method=AutoEncoder.autoencode,
    )
    diffusion, denoiser = create_diffusion(
        skeleton, diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency", latent_size=latent,
        diffusion_conditioning=True, diffusion_timesteps=10,
        diffusion_arch={"depth": 4, "attn_heads": 8, "attn_dim_head": 32,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
        compute_dtype=compute_dtype,
    )
    dparams = denoiser.init(
        jax.random.key(seed + 1), jnp.zeros((1, N, latent)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, N, latent)),
    )
    trainer = TrainerDiffusion(
        diffusion=diffusion, autoencoder=ae, ae_params=ae_params,
        lr=1e-3, train_pick_best_sample_among_k=k, similarity_space="input_space",
        prediction_horizon_eval=pred_len, num_prob_samples=k,
        step_start_ema=100, ema_update_every=10,
    )
    state = trainer.init(dparams)

    # fixed synthetic motion pool (same for both dtypes)
    pool = np.random.default_rng(7).standard_normal(
        (8, batch, obs_len + pred_len, N, 3)).astype(np.float32) * 0.25
    losses, times = [], []
    for it in range(steps):
        b = pool[it % len(pool)]
        x = jnp.asarray(b[:, :obs_len])
        y = jnp.asarray(b[:, obs_len:])
        t0 = time.perf_counter()
        state, loss = trainer.train_step(state, jax.random.key(1000 + it), (x, y))
        loss = float(loss)
        times.append(time.perf_counter() - t0)
        losses.append(loss)
    return np.asarray(losses), np.asarray(times[2:])  # drop compile steps


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--out", default=None, help="json dump path")
    args = ap.parse_args()

    fp32_loss, fp32_t = run(None, args.steps, args.batch, args.k)
    bf16_loss, bf16_t = run("bfloat16", args.steps, args.batch, args.k)

    rel = np.abs(bf16_loss - fp32_loss) / np.maximum(np.abs(fp32_loss), 1e-8)
    tail = slice(int(args.steps * 0.8), None)
    report = {
        "steps": args.steps, "batch": args.batch, "k": args.k,
        "fp32_step_p50_s": round(float(np.percentile(fp32_t, 50)), 4),
        "bf16_step_p50_s": round(float(np.percentile(bf16_t, 50)), 4),
        "speedup": round(float(np.percentile(fp32_t, 50) / np.percentile(bf16_t, 50)), 3),
        "loss_rel_diff_mean": round(float(rel.mean()), 5),
        "loss_rel_diff_max": round(float(rel.max()), 5),
        "fp32_final_loss_tail_mean": round(float(fp32_loss[tail].mean()), 6),
        "bf16_final_loss_tail_mean": round(float(bf16_loss[tail].mean()), 6),
        "fp32_first_last": [round(float(fp32_loss[0]), 6), round(float(fp32_loss[-1]), 6)],
        "bf16_first_last": [round(float(bf16_loss[0]), 6), round(float(bf16_loss[-1]), 6)],
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({**report,
                       "fp32_losses": fp32_loss.tolist(),
                       "bf16_losses": bf16_loss.tolist()}, f)


if __name__ == "__main__":
    main()
