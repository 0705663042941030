"""End-to-end toy tests: the README plug-and-play contract (README.md:72-98)
and a few training steps of both stages on tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from skeletondiffusion_tpu.diffusion import (
    GaussianDiffusion,
    build_nonisotropic_process,
    get_cov_from_corr,
)
from skeletondiffusion_tpu.models import AutoEncoder, Denoiser
from skeletondiffusion_tpu.train.trainer_autoencoder import AutoEncoderTrainer
from skeletondiffusion_tpu.train.trainer_diffusion import TrainerDiffusion


def _toy_diffusion(N=16, dim=24, cond_dim=0, depth=1, rng_seed=0):
    rng = np.random.default_rng(3)
    corr = rng.uniform(0, 1, (N, N))
    corr = (corr + corr.T) / 2
    np.fill_diagonal(corr, 0.0)
    Sigma_N, Lambda_N, U = get_cov_from_corr(corr)
    proc = build_nonisotropic_process(Sigma_N, Lambda_N, U, timesteps=10, objective="pred_x0")
    model = Denoiser(dim=dim, out_dim=dim, channels=N, cond_dim=cond_dim, depth=depth)

    def model_apply(params, x, t, x_cond):
        return model.apply(params, x, t, x_cond)

    diff = GaussianDiffusion(
        proc, model_apply, channels=N, latent_size=dim,
        diffusion_conditioning=cond_dim > 0,
    )
    x = jnp.zeros((2, N, dim))
    t = jnp.zeros((2,), jnp.int32)
    xc = jnp.zeros((2, N, cond_dim)) if cond_dim else None
    params = model.init(jax.random.key(rng_seed), x, t, xc)
    return diff, params


def test_readme_toy_loss_decreases_and_samples():
    """README.md:72-98: random 16-node correlation → train step + sample."""
    N, dim = 16, 24
    diff, params = _toy_diffusion(N=N, dim=dim)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    data = jax.random.normal(jax.random.key(1), (8, N, dim)) * 0.5

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            loss, w, _ = diff.loss(p, rng, data)
            return (loss * w).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_loss(params):
        # fixed t and fixed noise: isolates learning progress from the
        # per-step randomness of t (whose pred_x0 loss weight spans 0.93→0.007)
        t = jnp.full((data.shape[0],), 5, jnp.int32)
        loss, _, _ = diff.p_losses(params, jax.random.key(1234), data, t)
        return loss.mean()

    before = float(eval_loss(params))
    for i in range(30):
        params, opt_state, _ = step(params, opt_state, jax.random.key(i))
    after = float(eval_loss(params))
    assert after < before, (before, after)

    samples, noise = diff.sample(params, jax.random.key(99), batch_size=4)
    assert samples.shape == (4, N, dim)
    assert np.isfinite(np.asarray(samples)).all()
    assert noise.shape == (4, N, dim)


def test_autoencoder_trainer_loss_decreases():
    N, H, L, T_obs, PH = 4, 16, 16, 6, 8
    node_types = np.arange(N)
    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=H, decoder_hidden_size=H, latent_size=L,
        node_types=node_types,
    )
    trainer = AutoEncoderTrainer(
        model=ae, lr=5e-3, iter_per_epoch=4, prediction_horizon_train=PH,
        prediction_horizon_eval=PH, curriculum_it=1,
        prediction_horizon_train_min=2, prediction_horizon_train_min_from_epoch=2,
        random_prediction_horizon=True,
    )
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (4, T_obs, N, 3)) * 0.2
    y = jax.random.normal(jax.random.key(2), (4, PH, N, 3)) * 0.2
    state = trainer.init(rng, x, y)
    losses = []
    for it in range(24):
        state, loss, ph = trainer.train_step(state, jax.random.key(it), (x, y), epoch=it // 4 + 1, iteration=it)
        losses.append(float(loss))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses

    pred, yy, xx, z = trainer.validation_step(state, (x, y))
    assert pred.shape == (4, PH, N, 3)
    assert z.shape == (4, N, L)


@pytest.mark.parametrize("similarity_space", ["latent_space", "input_space"])
def test_diffusion_trainer_kbest(similarity_space):
    N, H, L, T_obs, PH, k = 4, 12, 12, 5, 6, 3
    node_types = np.arange(N)
    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=H, decoder_hidden_size=H, latent_size=L,
        node_types=node_types,
    )
    x = jax.random.normal(jax.random.key(1), (2, T_obs, N, 3)) * 0.2
    y = jax.random.normal(jax.random.key(2), (2, PH, N, 3)) * 0.2
    ae_params = ae.init(jax.random.key(0), y, x, ph=PH, method=AutoEncoder.autoencode)

    rngnp = np.random.default_rng(5)
    corr = rngnp.uniform(0, 1, (N, N))
    corr = (corr + corr.T) / 2
    np.fill_diagonal(corr, 0)
    Sigma_N, Lambda_N, U = get_cov_from_corr(corr)
    proc = build_nonisotropic_process(Sigma_N, Lambda_N, U, timesteps=4)
    den = Denoiser(dim=L, out_dim=L, channels=N, cond_dim=L, depth=1, node_types=node_types)

    diff = GaussianDiffusion(
        proc, lambda p, xx_, tt_, cc_: den.apply(p, xx_, tt_, cc_),
        channels=N, latent_size=L, diffusion_conditioning=True,
    )
    dparams = den.init(
        jax.random.key(3), jnp.zeros((2, N, L)), jnp.zeros((2,), jnp.int32), jnp.zeros((2, N, L))
    )
    trainer = TrainerDiffusion(
        diffusion=diff, autoencoder=ae, ae_params=ae_params, lr=1e-3,
        train_pick_best_sample_among_k=k, similarity_space=similarity_space,
        prediction_horizon_eval=PH, num_prob_samples=4, step_start_ema=1, ema_update_every=1,
    )
    state = trainer.init(dparams)
    losses = []
    for it in range(6):
        state, loss = trainer.train_step(state, jax.random.key(it), (x, y))
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
    # EMA params must track
    assert int(state.ema.step) == 6

    out, yy, samples, xx = trainer.validation_step(state, jax.random.key(7), (x, y))
    assert out.shape == (2, 4, PH, N, 3)
    assert samples.shape == (2, 4, N, L)
    assert np.isfinite(np.asarray(out)).all()
