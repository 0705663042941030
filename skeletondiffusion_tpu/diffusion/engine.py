"""Diffusion engine: couples a process (precomputed tables) with a denoiser
apply-function and provides training losses + compiled ancestral/DDIM
sampling.

This is the TPU-native counterpart of the reference's ``LatentDiffusion``
method surface (`src/core/diffusion/base.py:219-443`): the entire T-step
reverse process is a single ``lax.scan`` (one XLA program) instead of a
Python loop of kernel launches, and all randomness is explicit ``jax.random``
keys (reproducibility by construction; reference relies on global torch
seeding, `src/utils/reproducibility.py:9-23`).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .process import IsotropicProcess, NonisotropicProcess, extract

Array = jnp.ndarray
Process = Union[IsotropicProcess, NonisotropicProcess]
# model_apply(params, x[B,N,D], t[B] int32, x_cond[B,N,Dc] | None) -> [B,N,Dout]
ModelApply = Callable[..., Array]


class GaussianDiffusion:
    """Training/sampling engine around a diffusion process.

    ``channels`` is the number of skeleton nodes N and ``seq_length`` the
    latent feature size (96), mirroring the reference's (mis)naming
    (`base.py:94-99`).  All methods are pure in (params, rng, data) and can be
    jitted/vmapped/pjit-ed by callers.
    """

    def __init__(
        self,
        process: Process,
        model_apply: ModelApply,
        *,
        channels: int,
        latent_size: int = 96,
        diffusion_activation: str = "identity",
        diffusion_conditioning: bool = False,
        clip_denoised: bool = True,
        sampling_timesteps: Optional[int] = None,
        ddim_sampling_eta: float = 0.0,
        cond_embed: Optional[Callable] = None,
        model_apply_ucond: Optional[Callable] = None,
    ):
        """``cond_embed(params, x_cond) -> u_cond`` +
        ``model_apply_ucond(params, x, t, u_cond)``: optional fast path that
        hoists the loop-invariant conditioning projection out of the T-step
        sampling scan (the reference recomputes it every step,
        `base.py:243-255`)."""
        assert diffusion_activation in ("identity", "tanh")
        self.process = process
        self.model_apply = model_apply
        self.cond_embed = cond_embed
        self.model_apply_ucond = model_apply_ucond
        self.channels = channels
        self.seq_length = latent_size
        self.activation = diffusion_activation
        self.condition = diffusion_conditioning
        self.clip_denoised = clip_denoised
        self.num_timesteps = process.num_timesteps
        self.objective = process.objective
        self.sampling_timesteps = sampling_timesteps or process.num_timesteps
        assert self.sampling_timesteps <= process.num_timesteps
        self.is_ddim_sampling = self.sampling_timesteps < process.num_timesteps
        self.ddim_sampling_eta = ddim_sampling_eta
        # optional fully-fused sampling step on the node-major padded latent
        # layout: sample_step_nm(params, img_nm [N,B,Dp], t, u_cond_obj,
        # noise_nm [N,B,Dp]) -> img_nm.  Set by the eval predictor when the
        # Pallas denoiser+posterior kernels apply (pred_x0 + clip + identity);
        # see ops/pallas/{denoiser_fused,posterior_step}.py.
        self.sample_step_nm = None

    # ---- network interface -------------------------------------------------
    def feed_model(self, params, x: Array, t: Array, x_cond: Optional[Array] = None) -> Array:
        """Reference `base.py:243-255` (x_cond fan-out happens explicitly at
        the call sites here; no implicit repeat_interleave)."""
        if self.condition:
            assert x_cond is not None
        out = self.model_apply(params, x, t, x_cond)
        if self.activation == "tanh":
            out = jnp.tanh(out)
        return out

    def model_predictions(
        self, params, x: Array, t: Array, x_cond: Optional[Array] = None, clip_x_start: bool = False
    ) -> Tuple[Array, Array]:
        """(pred_noise, pred_x_start); reference `base.py:219-241`.

        When ``clip_x_start`` clips x̂₀, the returned noise is RE-DERIVED from
        the clipped x̂₀ so the pair stays self-consistent — the raw model
        output would silently bias DDIM steps whenever |x̂₀| > 1."""
        model_output = self.feed_model(params, x, t, x_cond)
        maybe_clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)

        if self.objective == "pred_noise":
            pred_noise = model_output
            x_start = maybe_clip(self.process.predict_start_from_noise(x, t, pred_noise))
            if clip_x_start:
                pred_noise = self.process.predict_noise_from_start(x, t, x_start)
        elif self.objective == "pred_x0":
            x_start = maybe_clip(model_output)
            pred_noise = self.process.predict_noise_from_start(x, t, x_start)
        elif self.objective == "pred_v":
            x_start = maybe_clip(self.process.predict_start_from_v(x, t, model_output))
            pred_noise = self.process.predict_noise_from_start(x, t, x_start)
        else:
            raise ValueError(self.objective)
        return pred_noise, x_start

    # ---- training ------------------------------------------------------------
    def p_losses(
        self,
        params,
        rng: jax.Array,
        x_start: Array,
        t: Array,
        x_cond: Optional[Array] = None,
        n_train_samples: int = 1,
        noise: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array]:
        """Per-sample diffusion losses.

        Returns ``(loss [b·k], loss_weight [b], model_out [b·k,N,D])``
        matching reference `base.py:262-300`.  With ``n_train_samples=k>1``
        the batch axis is fanned out k-fold (repeat_interleave layout:
        sample j of item i sits at row i·k+j).  ``noise``: optional injected
        white noise at the POST-fan-out shape ``[b·k, N, D]`` (the
        reference's ``p_losses(..., noise=...)`` parameter, `base.py:262`;
        used by the cross-implementation training-objective parity test).
        """
        b = x_start.shape[0]
        loss_weight = extract(self.process.loss_weight, t, 1).reshape(b)

        if n_train_samples > 1:
            x_start = jnp.repeat(x_start, n_train_samples, axis=0)
            t = jnp.repeat(t, n_train_samples, axis=0)
            if x_cond is not None:
                x_cond = jnp.repeat(x_cond, n_train_samples, axis=0)

        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x = self.process.q_sample(x_start, t, noise)
        model_out = self.feed_model(params, x, t, x_cond)

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        elif self.objective == "pred_v":
            target = self.process.predict_v(x_start, t, noise)
        else:
            raise ValueError(self.objective)

        loss = self.process.loss_terms(model_out, target, t)
        loss = loss.reshape(loss.shape[0], -1).mean(axis=-1)
        return loss, loss_weight, model_out

    def loss(
        self,
        params,
        rng: jax.Array,
        x: Array,
        x_cond: Optional[Array] = None,
        n_train_samples: int = 1,
        t: Optional[Array] = None,
        noise: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array]:
        """Sample t ~ U[0,T) per item and compute p_losses; reference
        `base.py:302-307` (``forward``).  ``t``/``noise``: optional injected
        timesteps/white noise for deterministic cross-implementation tests."""
        rng_t, rng_noise = jax.random.split(rng)
        b = x.shape[0]
        assert x.shape[-1] == self.seq_length
        if t is None:
            t = jax.random.randint(rng_t, (b,), 0, self.num_timesteps)
        return self.p_losses(
            params, rng_noise, x, t, x_cond=x_cond,
            n_train_samples=n_train_samples, noise=noise,
        )

    # ---- ancestral sampling -----------------------------------------------
    def p_sample_loop(
        self,
        params,
        rng: jax.Array,
        shape: Tuple[int, ...],
        x_cond: Optional[Array] = None,
        start_noise: Optional[Array] = None,
        step_noise: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """Full reverse process as ONE ``lax.scan`` over t = T-1 … 0;
        reference `base.py:324-390` (Python loop upstream).

        ``step_noise``: optional injected per-step noise ``[B, T-1, N, D]``
        (reference ``sampling_noise``, `base.py:330-333`): the noise used at
        timestep t>0 is ``step_noise[:, (T-1)-t]``.  When provided, the plain
        scan path is taken (the fused node-major path draws its own keys).

        Returns ``(x_0 samples, start_noise)``.
        """
        rng_start, rng_steps = jax.random.split(rng)
        if start_noise is None:
            start_noise = jax.random.normal(rng_start, shape, dtype=jnp.float32)
        img = start_noise
        batch = shape[0]

        # hoist the conditioning projection out of the scan when supported
        u_cond = None
        if self.cond_embed is not None and self.model_apply_ucond is not None and x_cond is not None:
            u_cond = self.cond_embed(params, x_cond)

        if (
            u_cond is not None
            and step_noise is None
            and self.sample_step_nm is not None
            and self.objective == "pred_x0"
            and self.clip_denoised
            and self.activation == "identity"
        ):
            # fully-fused path: carry the latent NODE-MAJOR and feature-PADDED
            # ([N, B, Dp]) across the scan — the Pallas denoiser consumes and
            # produces this layout directly and the posterior update runs as
            # one kernel, so no per-step transposes/pads/slices hit HBM.
            # Noise is still drawn in [B,N,D] order with the same fold_in
            # schedule, so samples are bit-identical to the plain path.
            d = shape[-1]
            dp = -(-d // 128) * 128
            to_nm = lambda a: jnp.pad(
                jnp.swapaxes(a, 0, 1), ((0, 0), (0, 0), (0, dp - d))
            )

            def step_nm(carry, t):
                img_nm, = carry
                noise = jax.random.normal(
                    jax.random.fold_in(rng_steps, t), shape, dtype=jnp.float32
                )
                img_nm = self.sample_step_nm(params, img_nm, t, u_cond, to_nm(noise))
                return (img_nm,), None

            ts = jnp.arange(self.num_timesteps - 1, -1, -1)
            (img_nm,), _ = jax.lax.scan(step_nm, (to_nm(img),), ts)
            return jnp.swapaxes(img_nm[:, :, :d], 0, 1), start_noise

        def step(carry, t):
            img, = carry
            # scalar t throughout: the time embedding broadcasts and the
            # process coefficient lookups use one [N,N] table slice instead
            # of a gathered [B,N,N] batch of identical matrices
            if u_cond is not None:
                model_output = self.model_apply_ucond(params, img, t, u_cond)
                if self.activation == "tanh":
                    model_output = jnp.tanh(model_output)
            else:
                tb = jnp.full((batch,), t, dtype=jnp.int32)
                model_output = self.feed_model(params, img, tb, x_cond)
            if self.objective == "pred_x0":
                x_start = model_output
            elif self.objective == "pred_noise":
                x_start = self.process.predict_start_from_noise(img, t, model_output)
            else:  # pred_v
                x_start = self.process.predict_start_from_v(img, t, model_output)
            if self.clip_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            mean, _, log_var = self.process.q_posterior(x_start, img, t)
            if step_noise is not None:
                # the index is out of range at t=0 (step_noise has T-1 rows);
                # mode="clip" keeps the gather well-defined (jit's default is
                # FILL → NaN, which would trip jax_debug_nans even though the
                # where() below zeroes the t=0 row, matching the reference)
                noise = jnp.take(
                    step_noise, self.num_timesteps - 1 - t, axis=1, mode="clip"
                )
            else:
                noise = jax.random.normal(jax.random.fold_in(rng_steps, t), shape, dtype=img.dtype)
            noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
            img = self.process.combine_mean_var_noise(mean, log_var, noise)
            return (img,), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (img,), _ = jax.lax.scan(step, (img,), ts)
        return img, start_noise

    def ddim_sample(
        self,
        params,
        rng: jax.Array,
        shape: Tuple[int, ...],
        x_cond: Optional[Array] = None,
        start_noise: Optional[Array] = None,
        step_noise: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """DDIM sampler (isotropic process only).  The reference's DDIM branch
        is dead code (`base.py:393-396`, ``times`` used before assignment);
        implemented correctly here from the published DDIM update rule —
        proven against the ancestral sampler via the η=1 full-schedule
        identity (`tests/test_ddim_equivalence.py`).

        ``step_noise`` [B, S-1, N, D]: optional injected noise, row i used at
        step-pair i (for the full schedule this matches ``p_sample_loop``'s
        ``[:, T-1-t]`` indexing, enabling pathwise comparison).
        """
        assert isinstance(self.process, IsotropicProcess), "DDIM requires the isotropic process"
        import numpy as np

        rng_start, rng_steps = jax.random.split(rng)
        if start_noise is None:
            start_noise = jax.random.normal(rng_start, shape, dtype=jnp.float32)
        img = start_noise
        batch = shape[0]
        eta = self.ddim_sampling_eta

        times = np.linspace(-1, self.num_timesteps - 1, self.sampling_timesteps + 1)
        times = list(reversed(times.astype(int).tolist()))
        time_pairs = list(zip(times[:-1], times[1:]))

        # hoist the loop-invariant conditioning projection (same fast path
        # as p_sample_loop) — without it every DDIM step recomputes the
        # [N,B,cond]·W product inside the model
        u_cond = None
        if self.cond_embed is not None and self.model_apply_ucond is not None and x_cond is not None:
            u_cond = self.cond_embed(params, x_cond)

        def predictions(img, time, tb):
            if u_cond is None:
                return self.model_predictions(
                    params, img, tb, x_cond, clip_x_start=self.clip_denoised
                )
            model_output = self.model_apply_ucond(params, img, time, u_cond)
            if self.activation == "tanh":
                model_output = jnp.tanh(model_output)
            maybe_clip = (
                (lambda v: jnp.clip(v, -1.0, 1.0)) if self.clip_denoised else (lambda v: v)
            )
            if self.objective == "pred_noise":
                x_start = maybe_clip(self.process.predict_start_from_noise(img, time, model_output))
            elif self.objective == "pred_x0":
                x_start = maybe_clip(model_output)
            else:  # pred_v
                x_start = maybe_clip(self.process.predict_start_from_v(img, time, model_output))
            return self.process.predict_noise_from_start(img, time, x_start), x_start

        acp = self.process.alphas_cumprod
        # ONE lax.scan over the S-1 noised step pairs (the denoiser is traced
        # once, not inlined S times — same design as p_sample_loop; a Python
        # loop here made compile time and program size scale with S, the
        # exact reference defect the module docstring calls out).  The final
        # pair (time_next = -1) consumes no noise and returns x̂₀ directly,
        # so it stays outside the scan.
        main_pairs = time_pairs[:-1]
        times_main = np.asarray([p[0] for p in main_pairs], dtype=np.int32)
        times_next = np.asarray([p[1] for p in main_pairs], dtype=np.int32)
        alphas = jnp.asarray(acp)[times_main] if len(main_pairs) else jnp.zeros((0,))
        alphas_next = jnp.asarray(acp)[times_next] if len(main_pairs) else jnp.zeros((0,))

        def body(img, inputs):
            i, time, alpha, alpha_next = inputs
            tb = jnp.full((batch,), time, dtype=jnp.int32)
            pred_noise, x_start = predictions(img, time, tb)
            sigma = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(1 - alpha_next - sigma**2)
            if step_noise is not None:
                noise = jnp.take(step_noise, i, axis=1)
            else:
                noise = jax.random.normal(
                    jax.random.fold_in(rng_steps, i), img.shape, dtype=img.dtype
                )
            img = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            return img, None

        xs = (jnp.arange(len(main_pairs), dtype=jnp.int32),
              jnp.asarray(times_main), alphas, alphas_next)
        img, _ = jax.lax.scan(body, img, xs)
        final_time = time_pairs[-1][0]
        tb = jnp.full((batch,), final_time, dtype=jnp.int32)
        _, x_start = predictions(img, jnp.asarray(final_time, jnp.int32), tb)
        return x_start, start_noise

    def sample(
        self,
        params,
        rng: jax.Array,
        batch_size: int = 16,
        x_cond: Optional[Array] = None,
        start_noise: Optional[Array] = None,
        step_noise: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """Public sampling API mirroring reference `base.py:439-443`."""
        shape = (batch_size, self.channels, self.seq_length)
        if self.is_ddim_sampling:
            return self.ddim_sample(
                params, rng, shape, x_cond=x_cond, start_noise=start_noise,
                step_noise=step_noise,
            )
        return self.p_sample_loop(
            params, rng, shape, x_cond=x_cond, start_noise=start_noise, step_noise=step_noise
        )

    def p_sample_loop_interpolating(
        self,
        params,
        rng: jax.Array,
        shape: Tuple[int, ...],
        noise2interpolate: Array,
        interpolate_fn: Callable[[Array, Array], Array],
        x_cond: Optional[Array] = None,
        start_noise: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """Ancestral sampling where each step's injected noise is interpolated
        with a caller-provided noise trajectory — the latent-space
        interpolation used for the reference's visualizations
        (`base.py:335-338`, `nonisotropic.py:218-227`).

        ``noise2interpolate``: [B, T-1, N, D] per-step noises (step order
        t = T-1 … 1, matching the reference's sampling_noise indexing).
        """
        rng_start, rng_steps = jax.random.split(rng)
        if start_noise is None:
            start_noise = jax.random.normal(rng_start, shape, dtype=jnp.float32)
        img = start_noise
        batch = shape[0]
        T = self.num_timesteps

        def step(carry, t):
            img, = carry
            tb = jnp.full((batch,), t, dtype=jnp.int32)
            model_output = self.feed_model(params, img, tb, x_cond)
            if self.objective == "pred_x0":
                x_start = model_output
            elif self.objective == "pred_noise":
                x_start = self.process.predict_start_from_noise(img, t, model_output)
            else:  # pred_v
                x_start = self.process.predict_start_from_v(img, t, model_output)
            if self.clip_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            mean, _, log_var = self.process.q_posterior(x_start, img, t)
            noise = jax.random.normal(jax.random.fold_in(rng_steps, t), shape, dtype=img.dtype)
            # reference indexes interpolation noise as [:, T-1-t]
            # (`base.py:331-336`); mode="clip" — the index is out of range at
            # t=0 and jit's default FILL would produce NaN that trips
            # jax_debug_nans even though the where() below discards it
            noise2 = jnp.take(noise2interpolate, T - 1 - t, axis=1, mode="clip")
            scaled1 = self.process.combine_mean_var_noise(jnp.zeros_like(mean), log_var, noise)
            scaled2 = self.process.combine_mean_var_noise(jnp.zeros_like(mean), log_var, noise2)
            interp = interpolate_fn(scaled1, scaled2)
            img = jnp.where(t > 0, mean + interp, mean)
            return (img,), None

        ts = jnp.arange(T - 1, -1, -1)
        (img,), _ = jax.lax.scan(step, (img,), ts)
        return img, start_noise
