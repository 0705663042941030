#!/usr/bin/env python
"""HBM footprint of the FULL-config stage-2 train step (AOT, no execution).

The reference's k=50 motion-argmin training needs a 48 GB GPU because torch
keeps the autograd graph of all 50 decoded futures alive
(`/root/reference/README.md:270`, `src/core/trainer.py:182-234`).  Here the
k-best similarity (decode + argmin) runs under ``stop_gradient`` so XLA
prunes it from the backward pass — this script puts a measured number on
that claim: it AOT-compiles ``TrainerDiffusion._train_step`` at the exact
published AMASS configuration (batch 64, k=50, input_space argmin, depth-4
denoiser, 10 timesteps, obs 30 / pred 120, latent 96) and prints the
compiled program's memory analysis (XLA's ``CompiledMemoryStats``).

Usage:  python scripts/train_memory_analysis.py [--batch 64] [--k 50]
        [--dtype bfloat16|float32] [--stage 2|1]

Prints one JSON line, e.g. peak HBM ("temp" + args + outputs) in GiB.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

OBS_LEN, PRED_LEN, LATENT = 30, 120, 96


def build_stage2(batch, k, compute_dtype, remat=False):
    from skeletondiffusion_tpu.diffusion.manager import create_diffusion
    from skeletondiffusion_tpu.models import AutoEncoder
    from skeletondiffusion_tpu.skeleton import create_skeleton
    from skeletondiffusion_tpu.train.trainer_diffusion import TrainerDiffusion

    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=OBS_LEN, pred_length=PRED_LEN, if_consider_hip=False,
    )
    N = skeleton.num_nodes
    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=96, decoder_hidden_size=96, latent_size=LATENT,
        node_types=skeleton.nodes_type_id, compute_dtype=compute_dtype,
    )
    ae_params = ae.init(
        jax.random.key(0), jnp.zeros((1, PRED_LEN, N, 3)), jnp.zeros((1, OBS_LEN, N, 3)),
        ph=PRED_LEN, method=AutoEncoder.autoencode,
    )
    diffusion, denoiser = create_diffusion(
        skeleton, diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency", latent_size=LATENT,
        diffusion_conditioning=True, diffusion_timesteps=10,
        diffusion_arch={"depth": 4, "attn_heads": 8, "attn_dim_head": 32,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
        compute_dtype=compute_dtype, remat_denoiser=remat,
    )
    dparams = denoiser.init(
        jax.random.key(1), jnp.zeros((1, N, LATENT)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, N, LATENT)),
    )
    # published config: lr 1e-3, k-best in input space, EMA on
    # (configs/config_train_diffusion/model/skeleton_diffusion.yaml)
    trainer = TrainerDiffusion(
        diffusion, ae, ae_params,
        lr=1e-3, train_pick_best_sample_among_k=k, similarity_space="input_space",
        prediction_horizon_eval=PRED_LEN, skeleton=skeleton,
    )
    state = trainer.init(dparams)
    x = jnp.zeros((batch, OBS_LEN, N, 3), jnp.float32)
    y = jnp.zeros((batch, PRED_LEN, N, 3), jnp.float32)
    args = (state, jax.random.key(2), x, y, jnp.asarray(1e-3, jnp.float32))
    fn = jax.jit(trainer._train_step, donate_argnums=(0,))
    return fn, args


def build_stage1(batch, compute_dtype):
    from skeletondiffusion_tpu.models import AutoEncoder
    from skeletondiffusion_tpu.skeleton import create_skeleton
    from skeletondiffusion_tpu.train.trainer_autoencoder import AutoEncoderTrainer

    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=OBS_LEN, pred_length=PRED_LEN, if_consider_hip=False,
    )
    N = skeleton.num_nodes
    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=96, decoder_hidden_size=96, latent_size=LATENT,
        node_types=skeleton.nodes_type_id, compute_dtype=compute_dtype,
    )
    trainer = AutoEncoderTrainer(
        ae, lr=3e-3, iter_per_epoch=100,
        prediction_horizon_train=PRED_LEN, prediction_horizon_eval=PRED_LEN,
    )
    x = jnp.zeros((batch, OBS_LEN, N, 3), jnp.float32)
    y = jnp.zeros((batch, PRED_LEN, N, 3), jnp.float32)
    state = trainer.init(jax.random.key(0), x[:1], y[:1])
    args = (state, jax.random.key(2), x, y, jnp.asarray(PRED_LEN, jnp.int32),
            jnp.asarray(3e-3, jnp.float32))
    fn = jax.jit(trainer._train_step, donate_argnums=(0,))
    return fn, args


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--stage", type=int, default=2, choices=(1, 2))
    p.add_argument("--remat", action="store_true",
                   help="remat_denoiser=True (stage 2 only)")
    args = p.parse_args()
    cdt = None if args.dtype in ("float32", "fp32") else args.dtype

    if args.stage == 2:
        fn, fargs = build_stage2(args.batch, args.k, cdt, remat=args.remat)
    else:
        fn, fargs = build_stage1(args.batch, cdt)

    lowered = fn.lower(*fargs)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    gib = 1024.0**3
    report = {
        "stage": args.stage,
        "backend": jax.default_backend(),
        "batch": args.batch,
        "k": args.k if args.stage == 2 else None,
        "remat": bool(args.remat) if args.stage == 2 else None,
        "compute_dtype": args.dtype,
        "argument_gib": round(mem.argument_size_in_bytes / gib, 4),
        "output_gib": round(mem.output_size_in_bytes / gib, 4),
        "temp_gib": round(mem.temp_size_in_bytes / gib, 4),
        "generated_code_gib": round(mem.generated_code_size_in_bytes / gib, 4),
        # peak live = args + outputs + temps (donation dedups state in/out)
        "peak_hbm_gib": round(
            (mem.argument_size_in_bytes + mem.output_size_in_bytes + mem.temp_size_in_bytes)
            / gib, 4,
        ),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
