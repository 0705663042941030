"""Worker for the two-process jax.distributed smoke test
(tests/test_multihost.py).  Each process brings 4 virtual CPU devices, joins
a 2-process cluster (8 global devices), and runs ONE data-parallel diffusion
train step on a global mesh — the DCN multi-host path the reference has no
counterpart for (SURVEY.md §2.7).

Usage: python multihost_worker.py <process_id> <coordinator_port>
"""
import os
import sys


def main(process_id: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # shared compilation cache: BOTH processes must reach the first collective
    # within Gloo's ~30 s KV-store timeout, so compile skew between them must
    # stay small (cache hits make re-runs near-instant)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    import jax.numpy as jnp
    import numpy as np

    from skeletondiffusion_tpu.diffusion.manager import create_diffusion
    from skeletondiffusion_tpu.models import AutoEncoder
    from skeletondiffusion_tpu.parallel import (
        coordination_barrier,
        create_mesh,
        shard_batch_global,
    )
    from skeletondiffusion_tpu.skeleton import create_skeleton
    from skeletondiffusion_tpu.train.trainer_diffusion import TrainerDiffusion

    OBS, PH, LAT, HID = 4, 6, 8, 8
    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=OBS, pred_length=PH, if_consider_hip=False,
    )
    N = skeleton.num_nodes
    mesh = create_mesh(8, model_parallel=1)

    ae = AutoEncoder(num_nodes=N, encoder_hidden_size=HID, decoder_hidden_size=HID,
                     latent_size=LAT, node_types=skeleton.nodes_type_id)
    # identical params on every process: same seed, host arrays are
    # implicitly replicated when passed into the global-mesh jit
    x_local = np.asarray(
        jax.random.normal(jax.random.key(1), (8, OBS, N, 3))
    )[process_id * 4:(process_id + 1) * 4] * 0.2
    y_local = np.asarray(
        jax.random.normal(jax.random.key(2), (8, PH, N, 3))
    )[process_id * 4:(process_id + 1) * 4] * 0.2
    ae_params = ae.init(jax.random.key(0), jnp.asarray(y_local[:2]),
                        jnp.asarray(x_local[:2]), ph=PH, method=AutoEncoder.autoencode)
    diffusion, denoiser = create_diffusion(
        skeleton, diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency", latent_size=LAT,
        diffusion_conditioning=True, diffusion_timesteps=2,
        diffusion_arch={"depth": 1, "attn_heads": 2, "attn_dim_head": 4,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
    )
    dparams = denoiser.init(jax.random.key(3), jnp.zeros((2, N, LAT)),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, N, LAT)))
    trainer = TrainerDiffusion(
        diffusion=diffusion, autoencoder=ae, ae_params=ae_params,
        lr=1e-3, train_pick_best_sample_among_k=2, similarity_space="latent_space",
        prediction_horizon_eval=PH, num_prob_samples=2,
        step_start_ema=1, ema_update_every=1,
    )
    state = trainer.init(dparams)

    with mesh:
        xb, yb = shard_batch_global(mesh, x_local), shard_batch_global(mesh, y_local)
        assert xb.shape[0] == 8, xb.shape  # global batch spans both processes
        # AOT-compile → coordination barrier → execute: Gloo's in-collective
        # rendezvous times out after ~30 s, while first-compile skew between
        # two processes on a contended host can be minutes.  Compiling first
        # and rendezvousing through the coordination service (generous,
        # configurable timeout) leaves the collective only execution skew.
        key, lr = jax.random.key(9), jnp.asarray(1e-3, jnp.float32)
        compiled = trainer._jit_step.lower(state, key, xb, yb, lr).compile()
        coordination_barrier("train_step_compiled", timeout_s=480)
        state, loss, _gnorm = compiled(state, key, xb, yb, lr)
        loss = float(loss)
    assert np.isfinite(loss), loss
    coordination_barrier("done", timeout_s=120)
    print(f"multihost process {process_id}: global_devices=8 loss={loss:.5f} OK",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
