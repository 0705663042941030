"""Training-schedule semantics: curriculum horizon, LR warmup/decay/floor,
EMA decay curve (ema_pytorch formulas)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from skeletondiffusion_tpu.train.ema import ema_init, ema_update
from skeletondiffusion_tpu.train.schedulers import (
    CurriculumPH,
    ExponentialLRSchedulerWarmup,
    cosine_annealing_factor,
)


def test_lr_scheduler_warmup_decay_floor():
    s = ExponentialLRSchedulerWarmup(lr=1e-3, warmup_duration=5, update_every=2,
                                     min_lr=8e-4, gamma_decay=0.9)
    lrs = [s.step(e) for e in range(1, 20)]
    assert all(lr == 1e-3 for lr in lrs[:4])          # epochs 1-4 < warmup
    assert lrs[5] == 1e-3 * 0.9                        # epoch 6 (even) decays
    assert lrs[6] == lrs[5]                            # odd epoch holds
    # the floor clamps at the NEXT epoch check (reference `scheduler.py:33-38`):
    # one decay may undershoot, then the value sticks at min_lr
    assert lrs[-1] == 8e-4
    first_clamped = lrs.index(8e-4)
    assert all(lr == 8e-4 for lr in lrs[first_clamped:])


def test_cosine_annealing_matches_ignite_first_cycle():
    c = 100
    # ignite CosineAnnealingScheduler(start=1,end=0): ½(1+cos(π t/c))
    for t in (0, 25, 50, 99):
        expected = 0.5 * (1 + math.cos(math.pi * t / c))
        assert abs(cosine_annealing_factor(t, c) - expected) < 1e-12
    assert cosine_annealing_factor(150, c) == 0.0      # start_value_mult=0 after cycle


def test_curriculum_ph_grows_and_respects_min():
    cur = CurriculumPH(
        prediction_horizon_train=100, prediction_horizon_train_min=10,
        prediction_horizon_train_min_from_epoch=5, curriculum_it=2,
        random_prediction_horizon=False, iter_per_epoch=10,
    )
    # iteration 0: factor=1 → ph = max(0,ph_min_ramp[0]=1) = 1
    assert cur(1, 0) == 1
    # past the curriculum cycle: factor=0 → full horizon
    assert cur(6, 50) == 100
    # mid-cycle monotone growth
    phs = [cur(1, it) for it in range(0, 20, 4)]
    assert phs == sorted(phs)


def test_ema_matches_ema_pytorch_semantics():
    params = {"w": jnp.ones((3,))}
    state = ema_init(params)
    live = {"w": jnp.zeros((3,))}
    kw = dict(beta=0.9, update_every=2, update_after_step=4, inv_gamma=1.0,
              power=2 / 3, min_value=0.0)
    vals = []
    for step in range(12):
        state = ema_update(state, live, **kw)
        vals.append(float(state.params["w"][0]))
    # steps 0..4: hard copies (≤ update_after_step) on update steps; skips hold
    assert vals[0] == 0.0 and vals[4] == 0.0
    # step 6 (first real update): epoch = 6-4-1 = 1 → decay = 1-2^(-2/3)
    d6 = 1 - (1 + 1) ** (-2 / 3)
    assert abs(vals[6] - (d6 * vals[5] + (1 - d6) * 0.0)) < 1e-6
    # odd steps unchanged (update_every=2)
    assert vals[7] == vals[6]
    # decay never exceeds beta
    for s_ in range(100):
        state = ema_update(state, live, **kw)
    epoch = float(state.step) - 4 - 1
    assert 1 - (1 + epoch) ** (-2 / 3) > 0.9  # raw value above beta → clamped


def test_isotropic_ddim_runs():
    """DDIM (our fixed implementation) samples finite latents."""
    from skeletondiffusion_tpu.diffusion import GaussianDiffusion, build_isotropic_process

    proc = build_isotropic_process(timesteps=10)
    diff = GaussianDiffusion(
        proc, lambda p, x, t, c: x * 0.5, channels=4, latent_size=8,
        sampling_timesteps=5, ddim_sampling_eta=0.0,
    )
    assert diff.is_ddim_sampling
    out, noise = diff.sample({}, jax.random.key(0), batch_size=3)
    assert out.shape == (3, 4, 8)
    assert np.isfinite(np.asarray(out)).all()
