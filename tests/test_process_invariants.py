"""Mathematical invariants of the diffusion processes, valid for EVERY T and
covariance — defense in depth beyond the reference-pinned goldens (which fix
one config): exact round-trip identities between the forward/inversion maps,
and Monte-Carlo consistency of the posterior coefficient tables with the
forward marginals (the telescoping property q(x_{t-1}|x0) =
∫ q(x_{t-1}|x_t,x0) q(x_t|x0) dx_t that the [T,N,N] tables must satisfy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeletondiffusion_tpu.diffusion.covariance import get_cov_from_corr
from skeletondiffusion_tpu.diffusion.process import (
    build_isotropic_process,
    build_nonisotropic_process,
)

N, D, T = 16, 5, 7


@pytest.fixture(scope="module")
def iso():
    return build_isotropic_process(timesteps=T, objective="pred_x0", beta_schedule="cosine")


@pytest.fixture(scope="module",
                params=["skeleton-diffusion", "anisotropic", "isotropic"])
def noniso(request):
    """Nonisotropic process under every Λ_t schedule the reference
    dispatches (`nonisotropic.py:43-60`); the 'isotropic' type requires
    Λ_N = 0 (run-as-isotropic)."""
    rng = np.random.default_rng(0)
    corr = rng.uniform(0, 1, (N, N))
    corr = (corr + corr.T) / 2
    np.fill_diagonal(corr, 0)
    run_as_iso = request.param == "isotropic"
    Sigma_N, Lambda_N, U = get_cov_from_corr(
        corr, if_run_as_isotropic=run_as_iso,
        diffusion_covariance_type=request.param,
    )
    return build_nonisotropic_process(
        Sigma_N, Lambda_N, U, timesteps=T, objective="pred_x0",
        beta_schedule="cosine", diffusion_covariance_type=request.param,
    )


def _all_t():
    return jnp.arange(T)


def _roundtrip_checks(proc):
    """predict_start_from_noise inverts q_sample exactly, and
    predict_noise_from_start recovers the injected white noise — at EVERY
    timestep (the goldens only pin a handful of (x, t) points)."""
    key = jax.random.key(1)
    x0 = jax.random.normal(key, (T, N, D))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (T, N, D))
    t = _all_t()
    x_t = proc.q_sample(x0, t, eps)
    np.testing.assert_allclose(
        np.asarray(proc.predict_start_from_noise(x_t, t, eps)), np.asarray(x0),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(proc.predict_noise_from_start(x_t, t, x0)), np.asarray(eps),
        atol=5e-5,
    )


def test_x0_and_noise_roundtrips_iso(iso):
    _roundtrip_checks(iso)


def test_x0_and_noise_roundtrips_noniso(noniso):
    _roundtrip_checks(noniso)


def test_v_parameterization_roundtrip(iso):
    x0 = jax.random.normal(jax.random.key(2), (T, N, D))
    eps = jax.random.normal(jax.random.key(3), (T, N, D))
    t = _all_t()
    x_t = iso.q_sample(x0, t, eps)
    v = iso.predict_v(x0, t, eps)
    np.testing.assert_allclose(
        np.asarray(iso.predict_start_from_v(x_t, t, v)), np.asarray(x0), atol=5e-6
    )


def test_eigendecomposition_reconstructs_sigma(noniso):
    assert bool(np.asarray(noniso.check_eigh()).all())


def test_posterior_noise_covariance_matches_tables(noniso):
    """combine_mean_var_noise(0, logΛ_post, ε) must have covariance
    U·diag(Λ_post_t)·Uᵀ — ties the clipped log-variance table, the U mixing,
    and the sampler's noise path together."""
    t = 3
    M = 200_000
    eps = jax.random.normal(jax.random.key(4), (M, N, 1))
    _, _, log_var = noniso.q_posterior(
        jnp.zeros((M, N, 1)), jnp.zeros((M, N, 1)), jnp.full((M,), t)
    )
    draws = np.asarray(noniso.combine_mean_var_noise(jnp.zeros((M, N, 1)), log_var, eps))[:, :, 0]
    got = np.cov(draws.T)
    lam = np.exp(np.asarray(noniso.Lambda_posterior_log_variance_clipped)[t])
    U = np.asarray(noniso.U)
    want = U @ np.diag(lam) @ U.T
    np.testing.assert_allclose(got, want, atol=6 * np.abs(want).max() / np.sqrt(M) * 10)


def _telescoping_check(proc):
    """Ancestral consistency: x_t ~ q(x_t|x0) then x_{t-1} ~ q(x_{t-1}|x_t,x0)
    must have the SAME distribution as x_{t-1} ~ q(x_{t-1}|x0).  Validates
    every posterior coefficient table against the forward tables at once —
    a wrong sign/transpose/off-by-one in any [T,N,N] buffer breaks this."""
    t = 4
    M = 200_000
    key = jax.random.key(5)
    x0 = jnp.broadcast_to(
        jax.random.normal(jax.random.fold_in(key, 0), (1, N, 1)), (M, N, 1)
    )
    tb = jnp.full((M,), t)
    x_t = proc.q_sample(x0, tb, jax.random.normal(jax.random.fold_in(key, 1), (M, N, 1)))
    mean, _, log_var = proc.q_posterior(x0, x_t, tb)
    x_prev = proc.combine_mean_var_noise(
        mean, log_var, jax.random.normal(jax.random.fold_in(key, 2), (M, N, 1))
    )
    # direct forward draw at t-1
    x_direct = proc.q_sample(
        x0, jnp.full((M,), t - 1), jax.random.normal(jax.random.fold_in(key, 3), (M, N, 1))
    )
    a = np.asarray(x_prev)[:, :, 0]
    b = np.asarray(x_direct)[:, :, 0]
    np.testing.assert_allclose(a.mean(0), b.mean(0), atol=4e-2)
    ca, cb = np.cov(a.T), np.cov(b.T)
    np.testing.assert_allclose(ca, cb, atol=max(1e-3, 0.05 * np.abs(cb).max()))


def test_posterior_telescopes_iso(iso):
    _telescoping_check(iso)


def test_posterior_telescopes_noniso(noniso):
    _telescoping_check(noniso)
