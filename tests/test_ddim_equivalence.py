"""DDIM correctness proof: with η=1 and the full step schedule, the DDIM
update is ALGEBRAICALLY the DDPM posterior step (DDIM paper App. B), so the
two samplers must agree PATHWISE given the same start and per-step noise.
The reference's DDIM branch is dead code (`base.py:393-396`), so no golden
can exist — this identity is the proof our implementation is the published
rule.  Also pins η=0 determinism and subsampled-schedule shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeletondiffusion_tpu.diffusion.manager import create_diffusion
from skeletondiffusion_tpu.skeleton import create_skeleton

L, T = 12, 6
ARCH = {"depth": 1, "attn_heads": 2, "attn_dim_head": 4,
        "use_attention": True, "learn_influence": True,
        "self_condition": False, "norm_type": "none"}


def _build(sampling_timesteps=None, eta=0.0, objective="pred_x0"):
    sk = create_skeleton(
        dataset_name="h36m", motion_repr_type="SkeletonRescalePose", num_joints=17,
        pose_box_size=1.5, obs_length=5, pred_length=8, if_consider_hip=False,
    )
    diffusion, den = create_diffusion(
        sk, diffusion_type="IsotropicGaussianDiffusion", latent_size=L,
        diffusion_conditioning=True, diffusion_timesteps=T,
        sampling_timesteps=sampling_timesteps, ddim_sampling_eta=eta,
        diffusion_objective=objective, diffusion_arch=ARCH,
    )
    params = den.init(
        jax.random.key(0), jnp.zeros((2, sk.num_nodes, L)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, sk.num_nodes, L)),
    )
    return sk, diffusion, params


@pytest.mark.parametrize("objective", ["pred_x0", "pred_noise"])
def test_ddim_eta1_full_schedule_equals_ancestral(objective):
    sk, ancestral, params = _build(objective=objective)
    # sampling_timesteps == T keeps is_ddim_sampling False (upstream
    # semantics: DDIM only engages when subsampling) — call ddim_sample
    # directly for the full-schedule identity
    _, ddim, _ = _build(sampling_timesteps=T, eta=1.0, objective=objective)
    assert not ancestral.is_ddim_sampling
    B, N = 4, sk.num_nodes
    shape = (B, N, L)
    x_cond = jax.random.normal(jax.random.key(1), shape) * 0.3
    start = jax.random.normal(jax.random.key(2), shape)
    noises = jax.random.normal(jax.random.key(3), (B, T - 1, N, L))
    # ancestral zeroes the noise at t=0 itself; DDIM's final pair
    # (time_next < 0) takes x_start directly — pad a dummy row for DDIM
    ddim_noise = jnp.concatenate([noises, jnp.zeros((B, 1, N, L))], axis=1)

    want, _ = ancestral.sample(
        params, jax.random.key(4), batch_size=B, x_cond=x_cond,
        start_noise=start, step_noise=noises,
    )
    got, _ = ddim.ddim_sample(
        params, jax.random.key(5), shape, x_cond=x_cond,
        start_noise=start, step_noise=ddim_noise,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ddim_eta0_is_deterministic_and_subsampled():
    sk, _, params = _build()
    _, ddim, _ = _build(sampling_timesteps=3, eta=0.0)
    B, N = 3, sk.num_nodes
    x_cond = jax.random.normal(jax.random.key(1), (B, N, L)) * 0.3
    start = jax.random.normal(jax.random.key(2), (B, N, L))
    a, _ = ddim.sample(params, jax.random.key(10), batch_size=B,
                       x_cond=x_cond, start_noise=start)
    b, _ = ddim.sample(params, jax.random.key(11), batch_size=B,
                       x_cond=x_cond, start_noise=start)
    # η=0: no injected noise anywhere — different rng keys, identical output
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all() and a.shape == (B, N, L)
