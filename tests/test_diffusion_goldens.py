"""Pin the JAX diffusion tables and process maths against golden values
extracted from the reference implementation (tests/make_goldens.py)."""
import os

import numpy as np
import pytest

from skeletondiffusion_tpu.diffusion import (
    build_isotropic_process,
    build_nonisotropic_process,
    cosine_beta_schedule,
    exp_beta_schedule,
    get_cov_from_corr,
    linear_beta_schedule,
)
from skeletondiffusion_tpu.skeleton import create_skeleton

GOLD = os.path.join(os.path.dirname(__file__), "goldens")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD) or not os.listdir(GOLD), reason="golden fixtures not generated"
)


def _load(name):
    return np.load(os.path.join(GOLD, name), allow_pickle=False)


def test_beta_schedules_match_reference():
    g = _load("schedules.npz")
    np.testing.assert_allclose(cosine_beta_schedule(10), g["cosine_T10"], atol=1e-12)
    np.testing.assert_allclose(linear_beta_schedule(10), g["linear_T10"], atol=1e-12)
    np.testing.assert_allclose(cosine_beta_schedule(50), g["cosine_T50"], atol=1e-12)
    # reference exp schedule has T+1 entries (quirk); ours keeps the first T
    np.testing.assert_allclose(exp_beta_schedule(10, 3.0), g["exp_T10"][:10], atol=1e-12)


def test_cov_from_amass_adjacency_matches_reference():
    g = _load("cov_amass.npz")
    sk = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=30, pred_length=120, if_consider_hip=False,
    )
    np.testing.assert_allclose(sk.adj_matrix, g["corr"], atol=0)
    Sigma_N, Lambda_N, U = get_cov_from_corr(sk.adj_matrix)
    np.testing.assert_allclose(Sigma_N, g["Sigma_N"], atol=1e-5)
    np.testing.assert_allclose(Lambda_N, g["Lambda_N"], atol=1e-5)
    # eigenvectors match up to column sign
    ref_U = g["U"]
    signs = np.sign(np.sum(U * ref_U, axis=0))
    np.testing.assert_allclose(U * signs, ref_U, atol=1e-4)


def test_cov_toy16_matches_reference():
    g = _load("cov_toy16.npz")
    Sigma_N, Lambda_N, U = get_cov_from_corr(g["corr"].astype(np.float32))
    np.testing.assert_allclose(Sigma_N, g["Sigma_N"], atol=1e-4)
    np.testing.assert_allclose(Lambda_N, g["Lambda_N"], atol=1e-4)


@pytest.fixture(scope="module")
def noniso():
    g = _load("noniso_amass.npz")
    proc = build_nonisotropic_process(
        Sigma_N=g["Sigma_N"], Lambda_N=g["Lambda_N"], U=g["U"],
        timesteps=10, objective="pred_x0", beta_schedule="cosine",
        diffusion_covariance_type="skeleton-diffusion", gamma_scheduler="cosine",
        loss_reduction_type="l1",
    )
    return proc, g


def test_noniso_buffers_match(noniso):
    proc, g = noniso
    pairs = {
        "betas": "betas",
        "alphas_cumprod": "alphas_cumprod",
        "alphas_cumprod_prev": "alphas_cumprod_prev",
        "sqrt_alphas_cumprod": "sqrt_alphas_cumprod",
        "Umm_sqrt_Lambda_bar_t": "Umm_sqrt_Lambda_bar_t",
        "Umm_sqrt_Lambda_bar_t_sqrt_recip_alphas_cumprod": "Umm_sqrt_Lambda_bar_t_sqrt_recip_alphas_cumprod",
        "inv_sqrt_Lambda_bar_mmUt": "inv_sqrt_Lambda_bar_mmUt",
        "inv_sqrt_Lambda_bar_sqrt_alphas_cumprod_mmUt": "inv_sqrt_Lambda_bar_sqrt_alphas_cumprod_mmUt",
        "posterior_mean_coef1_x0": "posterior_mean_coef1_x0",
        "posterior_mean_coef2_xt": "posterior_mean_coef2_xt",
        "Lambda_posterior": "Lambda_posterior",
        "Lambda_posterior_log_variance_clipped": "Lambda_posterior_log_variance_clipped",
        "mahalanobis_S_sqrt_recip": "mahalanobis_S_sqrt_recip",
        # pred_x0 → loss_weight IS alphas_cumprod (`nonisotropic.py:120-121`);
        # torch named_buffers dedups the aliased tensor, so compare against it
        "loss_weight": "alphas_cumprod",
        "Lambda_N": "Lambda_N",
        "Sigma_N": "Sigma_N",
        "U": "U",
    }
    for mine, ref in pairs.items():
        got = np.asarray(getattr(proc, mine))
        want = g[ref].astype(np.float32)
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=mine)


def test_noniso_q_sample_and_posterior_match(noniso):
    proc, g = noniso
    import jax.numpy as jnp

    x0, xt, noise, t = (jnp.asarray(g[k]) for k in ("x0", "xt", "noise", "t"))
    t = t.astype(jnp.int32)
    np.testing.assert_allclose(np.asarray(proc.q_sample(x0, t, noise)), g["q_sample"], atol=1e-4)
    mean, var, logvar = proc.q_posterior(x0, xt, t)
    np.testing.assert_allclose(np.asarray(mean), g["post_mean"], atol=1e-4)
    # reference broadcasts [B,N] vars to the x shape via trailing unsqueezes
    np.testing.assert_allclose(np.asarray(var)[..., 0], g["post_var"].reshape(var.shape[0], -1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logvar)[..., 0], g["post_logvar"].reshape(logvar.shape[0], -1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(proc.loss_terms(xt, x0, t)), g["loss_el"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(proc.predict_noise_from_start(xt, t, x0)), g["pred_noise"], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(proc.combine_mean_var_noise(mean, logvar, noise)), g["combined"], atol=1e-4
    )


def test_iso_buffers_and_math_match():
    g = _load("iso.npz")
    proc = build_isotropic_process(timesteps=10, objective="pred_x0", beta_schedule="cosine")
    for name in (
        "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2", "loss_weight",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(proc, name)), g[name].astype(np.float32), atol=2e-5, err_msg=name
        )
    import jax.numpy as jnp

    x0, xt, noise, t = (jnp.asarray(g[k]) for k in ("x0", "xt", "noise", "t"))
    t = t.astype(jnp.int32)
    np.testing.assert_allclose(np.asarray(proc.q_sample(x0, t, noise)), g["q_sample"], atol=1e-5)
    mean, var, logvar = proc.q_posterior(x0, xt, t)
    np.testing.assert_allclose(np.asarray(mean), g["post_mean"], atol=1e-5)


def test_run_as_isotropic_modes():
    # `utils.py:68-80`: skeleton-diffusion run-as-isotropic → Λ=1, U=I, Σ=0
    corr = np.zeros((8, 8))
    S, L, U = get_cov_from_corr(corr, if_run_as_isotropic=True,
                                diffusion_covariance_type="skeleton-diffusion")
    assert (L == 1).all() and (U == np.eye(8)).all() and (S == 0).all()
    S, L, U = get_cov_from_corr(corr, if_run_as_isotropic=True,
                                diffusion_covariance_type="anisotropic")
    assert (S == np.eye(8)).all()
