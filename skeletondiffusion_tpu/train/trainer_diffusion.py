"""Stage-2 trainer: nonisotropic latent diffusion with the k-best relaxed
objective.

Mirrors reference `src/core/trainer.py:106-313` (``TrainerDiffusion``): the
frozen autoencoder embeds past/future, the diffusion model produces k=50
per-sample losses + x̂₀ samples, all k samples are decoded (similarity space
'input_space') and only the loss of the sample closest to ground truth is
kept (`trainer.py:182-234`).

TPU-native wins over the reference:
* the k-best selection (decode + argmin) is wrapped in ``stop_gradient``, so
  XLA prunes the 50-sample × 100-step decode from the backward pass — the
  reference keeps the full autograd graph alive, which is why its k=50
  motion-argmin training needs a 48 GB GPU (README.md:270);
* one jitted train step: embeddings, q_sample, denoiser, decode, argmin,
  Adam update, EMA update all fuse into a single XLA program.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.engine import GaussianDiffusion
from ..models.autoencoder import AutoEncoder, autoencoder_loss
from .ema import EMAState, ema_init, ema_update
from .schedulers import make_lr_scheduler


class DiffTrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: EMAState
    step: jnp.ndarray


class TrainerDiffusion:
    def __init__(
        self,
        diffusion: GaussianDiffusion,
        autoencoder: AutoEncoder,
        ae_params,
        *,
        lr: float = 1e-4,
        weight_decay: float = 0.0,
        train_pick_best_sample_among_k: int = 1,
        similarity_space: str = "latent_space",
        if_use_ema: bool = True,
        ema_update_every: int = 10,
        ema_decay: float = 0.995,
        ema_power: float = 2.0 / 3.0,
        ema_min_value: float = 0.0,
        step_start_ema: int = 100,
        adam_betas: Tuple[float, float] = (0.9, 0.99),
        use_lr_scheduler: bool = False,
        lr_scheduler_kwargs: Optional[dict] = None,
        max_grad_norm: float = 1.0,
        prediction_horizon_eval: int = 100,
        num_prob_samples: int = 50,
        skeleton=None,
        **config,
    ):
        assert diffusion.condition, "stage-2 training requires conditioning"
        assert similarity_space in ("input_space", "metric_space", "latent_space")
        self.diffusion = diffusion
        self.autoencoder = autoencoder
        self.ae_params = ae_params
        self.k = train_pick_best_sample_among_k
        self.similarity_space = similarity_space
        self.skeleton = skeleton
        self.lr = lr
        self.ph_eval = prediction_horizon_eval
        self.num_prob_samples = num_prob_samples
        self.if_use_ema = if_use_ema
        self.ema_kwargs = dict(
            beta=ema_decay, update_every=ema_update_every, update_after_step=step_start_ema,
            power=ema_power, min_value=ema_min_value,
        )
        self.lr_scheduler = (
            make_lr_scheduler(lr=lr, **(lr_scheduler_kwargs or {})) if use_lr_scheduler else None
        )
        # weight decay BEFORE the Adam moments: the reference uses
        # torch.optim.Adam(weight_decay=·), i.e. coupled L2 added to the
        # gradient (decoupled AdamW-style decay after scale_by_adam would
        # diverge from reference trajectories whenever weight_decay > 0)
        self.tx = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.scale_by_adam(b1=adam_betas[0], b2=adam_betas[1]),
        )
        self._jit_step = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_val = jax.jit(self._validation_step, static_argnames=("num_samples",))

    # ---- state ---------------------------------------------------------------
    def init(self, params) -> DiffTrainState:
        # defensive copy: the first (donating) train step would otherwise
        # invalidate the caller's param buffers
        params = jax.tree.map(lambda p: jnp.array(p), params)
        return DiffTrainState(
            params=params,
            opt_state=self.tx.init(params),
            ema=ema_init(params) if self.if_use_ema else ema_init({}),
            step=jnp.asarray(0),
        )

    def _decode(self, x_t, latents):
        """Forward-only AE decode; uses the fused Pallas GRU-rollout kernel
        on TPU when shapes allow (this path is always under stop_gradient —
        the k-best selection, reference `trainer.py:182-205` — or in
        validation, so no VJP is ever needed through the kernel)."""
        from ..ops.pallas.gru_rollout import can_use_fused_decode, decode_rollout

        dec_params = self.ae_params["params"].get("decoder", {})
        if can_use_fused_decode(dec_params, x_t.shape[0]):
            return decode_rollout(
                dec_params, self.autoencoder.node_types,
                x_t[:, -2:], latents, ph=self.ph_eval,
            )
        return self.autoencoder.apply(
            self.ae_params, x_t, latents, None, ph=self.ph_eval, method=AutoEncoder.decode
        )

    # ---- loss ---------------------------------------------------------------
    def _embed(self, x, y):
        """Frozen-AE embeddings, both stop-grad (reference computes them
        under no_grad, `trainer.py:243-249`)."""
        z_past, z = self.autoencoder.apply(
            self.ae_params, y, x, method=AutoEncoder.get_train_embeddings
        )
        return jax.lax.stop_gradient(z_past), jax.lax.stop_gradient(z)

    def _similarity(self, samples, z, z_past, x, y):
        """Per-(item,sample) similarity-to-GT in the configured space;
        reference `trainer.py:182-205`.  Runs fully under stop_gradient —
        only the argmin index escapes.

        ``samples`` is the raw denoiser output and is decoded as if it were
        an x̂₀ latent — faithful to the reference, which feeds ``model_out``
        to the decoder REGARDLESS of the diffusion objective
        (`trainer.py:228-231`): for ``pred_x0`` (the flagship config) that
        is exactly x̂₀; for pred_noise/pred_v the reference decodes the
        noise/v prediction unchanged, and we reproduce that choice rather
        than silently diverging."""
        b = z.shape[0]
        k = self.k
        if self.similarity_space == "latent_space":
            return None  # handled by caller from the diffusion loss itself
        x_t = jnp.repeat(x, k, axis=0)
        out = self._decode(x_t, samples)  # [b·k, T, N, 3]
        out = out.reshape(b, k, *out.shape[1:])
        if self.similarity_space == "input_space":
            fut = y[:, None]  # broadcast over k
            # the reference compares with the AE's configured loss type
            # (`autoencoder.py:80-81`), not a fixed L1
            return autoencoder_loss(
                out, fut, loss_type=self.autoencoder.loss_pose_type, reduction="none"
            )  # [b,k]
        # metric_space: mean-over-time norm in metric coordinates
        out_m = self.skeleton.transform_to_metric_space(out).reshape(b, k, out.shape[2], -1)
        fut_m = self.skeleton.transform_to_metric_space(y).reshape(b, 1, y.shape[1], -1)
        return jnp.linalg.norm(out_m - fut_m, axis=-1).mean(axis=-1)

    def loss(self, params, rng, x, y, z, z_past, t=None, noise=None):
        """k-best relaxed diffusion loss; reference `trainer.py:207-234`.
        ``t``/``noise``: optional injected timesteps/white noise (the
        cross-implementation training-objective parity test pins this whole
        composition against the reference's torch code on shared weights)."""
        b = z.shape[0]
        loss, diff_weights, samples = self.diffusion.loss(
            params, rng, z, x_cond=z_past, n_train_samples=self.k,
            t=t, noise=noise,
        )
        if self.k > 1:
            if self.similarity_space == "latent_space":
                sim = loss.reshape(b, self.k)
            else:
                sim = jax.lax.stop_gradient(
                    self._similarity(jax.lax.stop_gradient(samples), z, z_past, x, y)
                )
            idx = jnp.argmin(sim, axis=-1)
            loss = jnp.take_along_axis(loss.reshape(b, self.k), idx[:, None], axis=1)[:, 0]
        return (loss * diff_weights).mean()

    # ---- steps ------------------------------------------------------------
    def _train_step(self, state: DiffTrainState, rng, x, y, lr):
        z_past, z = self._embed(x, y)

        def loss_fn(params):
            return self.loss(params, rng, x, y, z, z_past)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, **self.ema_kwargs) if self.if_use_ema else state.ema
        return (
            DiffTrainState(params=params, opt_state=opt_state, ema=ema, step=state.step + 1),
            loss,
            optax.global_norm(grads),
        )

    def train_step(self, state: DiffTrainState, rng, batch):
        x, y = batch
        lr = self.lr if self.lr_scheduler is None else self.lr_scheduler._current
        state, loss, gnorm = self._jit_step(state, rng, x, y, jnp.asarray(lr, jnp.float32))
        # lazy device scalar for observability (reference logs grad scalars
        # every 100 iterations, `src/utils/tensorboard.py:58-122`); only
        # forces a sync if the caller float()s it
        self.last_grad_norm = gnorm
        return state, loss

    def epoch_started(self, epoch: int):
        if self.lr_scheduler is not None:
            self.lr_scheduler.step(epoch)

    # ---- validation ------------------------------------------------------------
    def _validation_step(self, params, rng, x, num_samples: int):
        """Sample ``num_samples`` latents per obs with the (EMA) model and
        decode; reference `trainer.py:289-312`."""
        b = x.shape[0]
        z_past = self.autoencoder.apply(self.ae_params, x, method=AutoEncoder.get_past_embedding)
        x_cond = jnp.repeat(z_past, num_samples, axis=0)
        samples, _ = self.diffusion.sample(params, rng, batch_size=b * num_samples, x_cond=x_cond)
        x_t = jnp.repeat(x, num_samples, axis=0)
        out = self._decode(x_t, samples)
        out = out.reshape(b, num_samples, *out.shape[1:])
        samples = samples.reshape(b, num_samples, *samples.shape[1:])
        return out, samples

    def validation_step(self, state: DiffTrainState, rng, batch):
        x, y = batch
        params = state.ema.params if self.if_use_ema else state.params
        out, samples = self._jit_val(params, rng, x, num_samples=self.num_prob_samples)
        return out, y, samples, x
