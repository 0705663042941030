"""Stage-1 trainer: graph-recurrent AutoEncoder with prediction-horizon
curriculum.

Mirrors reference `src/core/trainer.py:17-104` (``AutoEncoderTrainer``):
AdamW(amsgrad) + grad-clip 1.0, cosine-annealed curriculum growing the
decoded horizon from 1 to full with a randomized lower bound.  TPU-native
twist: the dynamic horizon ``ph`` is a *traced scalar* — the decoder always
rolls out the full horizon inside one compiled program and the loss is
masked to the first ``ph`` frames; the future encoder reads the hidden state
at step ``ph-1`` (causal GRU ⇒ identical to truncating).  One XLA program
for all curriculum stages instead of one compile per horizon.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.autoencoder import AutoEncoder
from .schedulers import CurriculumPH, make_lr_scheduler


class AETrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class _AmsgradTorchState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any
    # named nu_max_raw (not nu_max) ON PURPOSE: optax.ScaleByAmsgradState's
    # nu_max holds the max of BIAS-CORRECTED estimates — structurally
    # identical but numerically incompatible.  The distinct field name makes
    # restoring a pre-change checkpoint fail loudly instead of silently
    # resuming with double-corrected denominators.
    nu_max_raw: Any


def scale_by_amsgrad_torch(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """AMSGrad with torch.optim's exact semantics: max over the RAW second
    moment, bias-correct afterwards (``max_exp_avg_sq`` then
    ``sqrt(max_exp_avg_sq / bias_correction2)``).

    optax.scale_by_amsgrad instead maxes the bias-CORRECTED estimate; early
    in training the correction factor 1/(1-b2^t) inflates step-1's ν̂ far
    above later steps', so optax's running max stays pinned there and its
    denominators systematically exceed torch's — trajectories diverge from
    the reference within 2 steps (pinned by
    tests/test_train_objective_parity.py::test_stage1_optimizer_trajectory)."""

    def init_fn(params):
        # three DISTINCT zero trees: the train step donates the optimizer
        # state, and a shared buffer appearing in multiple donated leaves is
        # a runtime error ("attempt to donate the same buffer twice")
        def zeros():
            return jax.tree.map(jnp.zeros_like, params)

        return _AmsgradTorchState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros(),
            nu_max_raw=zeros(),
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * g, updates, state.mu)
        nu = jax.tree.map(lambda g, v: b2 * v + (1 - b2) * g * g, updates, state.nu)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max_raw, nu)
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max
        )
        return out, _AmsgradTorchState(count=count, mu=mu, nu=nu, nu_max_raw=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


class AutoEncoderTrainer:
    def __init__(
        self,
        model: AutoEncoder,
        lr: float,
        iter_per_epoch: int,
        prediction_horizon_train: int,
        prediction_horizon_eval: int,
        curriculum_it: int = 0,
        clip_grad_norm: Optional[float] = 1.0,
        use_lr_scheduler: bool = False,
        lr_scheduler_kwargs: Optional[dict] = None,
        weight_decay: float = 1e-2,  # torch AdamW default, implied by `trainer.py:33`
        prediction_horizon_train_min: int = 10,
        prediction_horizon_train_min_from_epoch: int = 200,
        random_prediction_horizon: bool = True,
        loss_pose_type: str = "l1",
        seed: int = 0,
        **config,
    ):
        self.model = model
        self.lr = lr
        self.ph_train = prediction_horizon_train
        self.ph_eval = prediction_horizon_eval
        self.loss_pose_type = loss_pose_type
        self.curriculum = CurriculumPH(
            prediction_horizon_train=prediction_horizon_train,
            prediction_horizon_train_min=prediction_horizon_train_min,
            prediction_horizon_train_min_from_epoch=prediction_horizon_train_min_from_epoch,
            curriculum_it=curriculum_it,
            random_prediction_horizon=random_prediction_horizon,
            iter_per_epoch=iter_per_epoch,
            seed=seed,
        )
        self.lr_scheduler = (
            make_lr_scheduler(lr=lr, **(lr_scheduler_kwargs or {})) if use_lr_scheduler else None
        )
        tx = [optax.clip_by_global_norm(clip_grad_norm)] if clip_grad_norm else []
        tx += [scale_by_amsgrad_torch(), optax.add_decayed_weights(weight_decay)]
        self.tx = optax.chain(*tx)
        self._jit_step = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_val = jax.jit(self._validation_step)

    # ---- state ------------------------------------------------------------
    def init(self, rng: jax.Array, example_x: jnp.ndarray, example_y: jnp.ndarray) -> AETrainState:
        params = self.model.init(
            rng, example_y, example_x, ph=self.ph_train, method=AutoEncoder.autoencode
        )
        params = jax.tree.map(lambda p: jnp.array(p), params)
        return AETrainState(params=params, opt_state=self.tx.init(params), step=jnp.asarray(0))

    # ---- steps ---------------------------------------------------------------
    def _masked_loss(self, pred, y, ph):
        """L1/MSE sum over xyz, mean joints, masked mean over the first
        ``ph`` frames (≡ reference loss on ``y[:, :ph]``,
        `autoencoder.py:80-98` + `trainer.py:84-89`)."""
        if self.loss_pose_type == "mse":
            el = (pred - y) ** 2
        else:
            el = jnp.abs(pred - y)
        per_frame = el.sum(-1).mean(-1)  # [B, PH]
        mask = (jnp.arange(per_frame.shape[1]) < ph).astype(per_frame.dtype)
        return (per_frame * mask).sum(-1) / ph

    def _train_step(self, state: AETrainState, rng, x, y, ph, lr):
        def loss_fn(params):
            pred, _, _ = self.model.apply(
                params, y, x, ph=self.ph_train, y_last_index=ph - 1,
                method=AutoEncoder.autoencode,
            )
            return self._masked_loss(pred, y, ph).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return (
            AETrainState(params=params, opt_state=opt_state, step=state.step + 1),
            loss,
            optax.global_norm(grads),
        )

    def train_step(self, state: AETrainState, rng, batch, epoch: int, iteration: int):
        """Host-side wrapper: resolves curriculum ph + lr, calls the jitted
        step.  Returns (state, loss, ph)."""
        x, y = batch
        ph = self.curriculum(epoch, iteration)
        lr = self.lr if self.lr_scheduler is None else self.lr_scheduler._current
        state, loss, gnorm = self._jit_step(
            state, rng, x, y, jnp.asarray(ph, jnp.int32), jnp.asarray(lr, jnp.float32)
        )
        # lazy device scalar (see trainer_diffusion.train_step)
        self.last_grad_norm = gnorm
        return state, loss, ph

    def epoch_started(self, epoch: int):
        if self.lr_scheduler is not None:
            self.lr_scheduler.step(epoch)

    def _validation_step(self, params, x, y):
        pred, z_past, z = self.model.apply(
            params, y, x, ph=self.ph_eval, method=AutoEncoder.autoencode
        )
        return pred, z

    def validation_step(self, state: AETrainState, batch):
        x, y = batch
        pred, z = self._jit_val(state.params, x, y)
        return pred, y, x, z
