"""The reference documents that the nonisotropic implementation configured
as run-as-isotropic reproduces the isotropic implementation exactly
(README.md:325-340).  Verify our two process implementations agree in that
mode, and that checkpoints round-trip bit-exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from skeletondiffusion_tpu.diffusion import (
    build_isotropic_process,
    build_nonisotropic_process,
    get_cov_from_corr,
)


def test_run_as_isotropic_matches_isotropic_process():
    N, D, B, T = 7, 12, 5, 10
    Sigma_N, Lambda_N, U = get_cov_from_corr(
        np.zeros((N, N)), if_run_as_isotropic=True,
        diffusion_covariance_type="skeleton-diffusion",
    )
    noniso = build_nonisotropic_process(
        Sigma_N, Lambda_N, U, timesteps=T, objective="pred_x0",
        diffusion_covariance_type="skeleton-diffusion", gamma_scheduler="cosine",
    )
    iso = build_isotropic_process(timesteps=T, objective="pred_x0")

    # Λ_N = 1 ⇒ Λ_I = 0 ⇒ the skeleton-diffusion schedule degenerates to the
    # standard DDPM one
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    xt = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, T, B).astype(np.int32))

    np.testing.assert_allclose(
        np.asarray(noniso.q_sample(x0, t, noise)), np.asarray(iso.q_sample(x0, t, noise)),
        atol=1e-5,
    )
    m1, _, lv1 = noniso.q_posterior(x0, xt, t)
    m2, _, lv2 = iso.q_posterior(x0, xt, t)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    # log-variances broadcast differently ([B,N,1] vs [B,1,1]) but agree in value
    np.testing.assert_allclose(
        np.asarray(jnp.broadcast_to(lv1, m1.shape)),
        np.asarray(jnp.broadcast_to(lv2, m2.shape)), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(noniso.predict_noise_from_start(xt, t, x0)),
        np.asarray(iso.predict_noise_from_start(xt, t, x0)),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(noniso.combine_mean_var_noise(m1, lv1, noise)),
        np.asarray(iso.combine_mean_var_noise(m2, lv2, noise)),
        atol=1e-5,
    )


def test_checkpoint_roundtrip(tmp_path):
    from skeletondiffusion_tpu.train.checkpoint import CheckpointManager
    from skeletondiffusion_tpu.train.ema import ema_init
    from skeletondiffusion_tpu.train.trainer_diffusion import DiffTrainState

    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))}
    state = DiffTrainState(
        params=params, opt_state={"m": jnp.zeros((3, 4))}, ema=ema_init(params),
        step=jnp.asarray(7),
    )
    mgr = CheckpointManager(str(tmp_path / "ck"), n_saved=2)
    mgr.save(state, step=1, score=-1.0)
    mgr.save(state, step=2, score=-0.5)
    mgr.save(state, step=3, score=-2.0)
    mgr.save_latest(state, step=3)

    assert mgr.best_path().endswith("ckpt_2")
    restored = mgr.restore(jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.asarray(params["w"]))
    assert int(restored.step) == 7

    partial = mgr.restore_partial({"params": jax.tree.map(jnp.zeros_like, params)}, mgr.best_path())
    np.testing.assert_array_equal(np.asarray(partial["params"]["b"]), np.ones(4))
