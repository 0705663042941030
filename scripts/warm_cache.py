#!/usr/bin/env python
"""Warm the persistent XLA compile cache with the flagship programs.

First compiles through the axon tunnel take ~10–20 min; this script
populates ``JAX_COMPILATION_CACHE_DIR`` (default /tmp/jax_cache_skeldiff)
with the two programs every session needs — the 50-sample eval predictor at
AMASS configuration and the stage-2 train step — so subsequent CLI/bench
runs start hot.

    python scripts/warm_cache.py            # eval + train programs
    python scripts/warm_cache.py eval       # eval only
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def warm_eval():
    import bench

    skeleton, predictor, full = bench.build()
    obs = jnp.zeros((bench.BATCH, bench.OBS_LEN, skeleton.num_nodes, 3), jnp.float32)
    t0 = time.time()
    r = full(predictor.ae_params, predictor.diff_params, jax.random.key(0), obs)
    jax.block_until_ready(r)
    print(f"eval program compiled+run in {time.time() - t0:.1f}s")


def warm_train():
    from skeletondiffusion_tpu.diffusion.manager import create_diffusion
    from skeletondiffusion_tpu.models import AutoEncoder
    from skeletondiffusion_tpu.skeleton import create_skeleton
    from skeletondiffusion_tpu.train.trainer_diffusion import TrainerDiffusion

    OBS, PRED, L, B, K = 30, 120, 96, 64, 50
    sk = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=OBS, pred_length=PRED, if_consider_hip=False,
    )
    N = sk.num_nodes
    ae = AutoEncoder(num_nodes=N, encoder_hidden_size=96, decoder_hidden_size=96,
                     latent_size=L, node_types=sk.nodes_type_id)
    aep = ae.init(jax.random.key(0), jnp.zeros((1, PRED, N, 3)), jnp.zeros((1, OBS, N, 3)),
                  ph=PRED, method=AutoEncoder.autoencode)
    diffusion, den = create_diffusion(
        sk, diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency", latent_size=L, diffusion_conditioning=True,
        diffusion_timesteps=10,
        diffusion_arch={"depth": 4, "attn_heads": 8, "attn_dim_head": 32,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
    )
    dp = den.init(jax.random.key(1), jnp.zeros((1, N, L)), jnp.zeros((1,), jnp.int32),
                  jnp.zeros((1, N, L)))
    tr = TrainerDiffusion(diffusion, ae, aep, lr=1e-4, train_pick_best_sample_among_k=K,
                          similarity_space="input_space", prediction_horizon_eval=PRED,
                          skeleton=sk)
    state = tr.init(dp)
    x = jnp.zeros((B, OBS, N, 3)); y = jnp.zeros((B, PRED, N, 3))
    t0 = time.time()
    state, loss = tr.train_step(state, jax.random.key(2), (x, y))
    jax.block_until_ready(loss)
    print(f"train program compiled+run in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "eval"):
        warm_eval()
    if which in ("all", "train"):
        warm_train()
    print("cache dir:", os.environ["JAX_COMPILATION_CACHE_DIR"])
