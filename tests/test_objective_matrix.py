"""Objective × process smoke matrix: every (diffusion type, objective)
combination the reference supports (`base.py:101` allows pred_noise /
pred_x0 / pred_v; nonisotropic pred_v is explicitly unimplemented upstream,
`nonisotropic.py:118-124`) trains (loss + finite grads) and samples here."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeletondiffusion_tpu.diffusion.manager import create_diffusion
from skeletondiffusion_tpu.skeleton import create_skeleton

L = 12
ARCH = {"depth": 1, "attn_heads": 2, "attn_dim_head": 4,
        "use_attention": True, "learn_influence": True,
        "self_condition": False, "norm_type": "none"}


@pytest.fixture(scope="module")
def sk():
    return create_skeleton(
        dataset_name="h36m", motion_repr_type="SkeletonRescalePose", num_joints=17,
        pose_box_size=1.5, obs_length=5, pred_length=8, if_consider_hip=False,
    )


@pytest.mark.parametrize("diffusion_type,objective", [
    ("IsotropicGaussianDiffusion", "pred_noise"),
    ("IsotropicGaussianDiffusion", "pred_x0"),
    ("IsotropicGaussianDiffusion", "pred_v"),
    ("NonisotropicGaussianDiffusion", "pred_noise"),
    ("NonisotropicGaussianDiffusion", "pred_x0"),
])
def test_loss_grads_and_sampling_run(sk, diffusion_type, objective):
    kwargs = dict(
        diffusion_type=diffusion_type, latent_size=L,
        diffusion_conditioning=True, diffusion_timesteps=4,
        diffusion_objective=objective, diffusion_arch=ARCH,
    )
    if diffusion_type == "NonisotropicGaussianDiffusion":
        kwargs["covariance_matrix_type"] = "adjacency"
    diffusion, den = create_diffusion(sk, **kwargs)
    N = sk.num_nodes
    params = den.init(
        jax.random.key(0), jnp.zeros((2, N, L)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, N, L)),
    )
    x = jax.random.normal(jax.random.key(1), (4, N, L)) * 0.5
    x_cond = jax.random.normal(jax.random.key(2), (4, N, L)) * 0.5

    def scalar(p):
        loss, w, _ = diffusion.loss(p, jax.random.key(3), x, x_cond=x_cond)
        return jnp.mean(loss * w)

    loss, grads = jax.value_and_grad(scalar)(params)
    assert np.isfinite(float(loss))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0.0, gnorm

    samples, _ = diffusion.sample(params, jax.random.key(4), batch_size=3, x_cond=x_cond[:3])
    assert samples.shape == (3, N, L)
    assert np.isfinite(np.asarray(samples)).all()

    if diffusion_type == "IsotropicGaussianDiffusion":
        # DDIM (isotropic-only, as upstream) must run for every objective
        ddim, _ = create_diffusion(sk, sampling_timesteps=2, **kwargs)
        s, _ = ddim.sample(params, jax.random.key(5), batch_size=3, x_cond=x_cond[:3])
        assert s.shape == (3, N, L) and np.isfinite(np.asarray(s)).all()


@pytest.mark.parametrize("cov_kwargs", [
    # diffusion_covariance_type='isotropic' requires Λ_N == 0 (same assert
    # upstream, `nonisotropic.py:44`) — reachable via if_run_as_isotropic
    dict(covariance_matrix_type="adjacency", diffusion_covariance_type="isotropic",
         if_run_as_isotropic=True),
    dict(covariance_matrix_type="adjacency", diffusion_covariance_type="anisotropic"),
    dict(covariance_matrix_type="adjacency", diffusion_covariance_type="skeleton-diffusion",
         gamma_scheduler="mono_decrease"),
    dict(covariance_matrix_type="reachability", diffusion_covariance_type="skeleton-diffusion"),
    dict(covariance_matrix_type="adjacency", diffusion_covariance_type="skeleton-diffusion",
         sigma_n_scale="frob"),
], ids=["cov-iso", "cov-aniso", "gamma-mono", "reachability", "frob"])
def test_nonisotropic_covariance_variants_run(sk, cov_kwargs):
    """Every covariance-schedule variant the reference dispatches
    (`nonisotropic.py` Λ_t construction, `diffusion_manager.py` correlation
    source, `get_cov_from_corr` normalization) trains and samples."""
    diffusion, den = create_diffusion(
        sk, diffusion_type="NonisotropicGaussianDiffusion", latent_size=L,
        diffusion_conditioning=True, diffusion_timesteps=4,
        diffusion_arch=ARCH, **cov_kwargs,
    )
    N = sk.num_nodes
    params = den.init(
        jax.random.key(0), jnp.zeros((2, N, L)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, N, L)),
    )
    x = jax.random.normal(jax.random.key(1), (4, N, L)) * 0.5
    x_cond = jax.random.normal(jax.random.key(2), (4, N, L)) * 0.5
    loss, w, _ = diffusion.loss(params, jax.random.key(3), x, x_cond=x_cond)
    assert np.isfinite(float(jnp.mean(loss * w)))
    s, _ = diffusion.sample(params, jax.random.key(4), batch_size=2, x_cond=x_cond[:2])
    assert s.shape == (2, N, L) and np.isfinite(np.asarray(s)).all()


@pytest.mark.parametrize("beta", ["linear", "cosine", "exp"])
def test_isotropic_beta_schedules_run(sk, beta):
    # T=50: the linear schedule's reference-parity 1000/T scaling
    # (`base.py:39-43`) yields β>1 (NaN training) for T≲20 — upstream has
    # the identical behavior, so small-T linear is an invalid config there too
    diffusion, den = create_diffusion(
        sk, diffusion_type="IsotropicGaussianDiffusion", latent_size=L,
        diffusion_conditioning=True, diffusion_timesteps=50,
        beta_schedule=beta, diffusion_arch=ARCH,
    )
    N = sk.num_nodes
    params = den.init(
        jax.random.key(0), jnp.zeros((2, N, L)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, N, L)),
    )
    x = jax.random.normal(jax.random.key(1), (4, N, L)) * 0.5
    x_cond = jax.random.normal(jax.random.key(2), (4, N, L)) * 0.5
    loss, w, _ = diffusion.loss(params, jax.random.key(3), x, x_cond=x_cond)
    assert np.isfinite(float(jnp.mean(loss * w)))
    s, _ = diffusion.sample(params, jax.random.key(4), batch_size=2, x_cond=x_cond[:2])
    assert np.isfinite(np.asarray(s)).all()


def test_nonisotropic_pred_v_rejected_like_reference(sk):
    with pytest.raises(NotImplementedError):
        create_diffusion(
            sk, diffusion_type="NonisotropicGaussianDiffusion",
            covariance_matrix_type="adjacency", latent_size=L,
            diffusion_conditioning=True, diffusion_timesteps=4,
            diffusion_objective="pred_v", diffusion_arch=ARCH,
        )
