"""Latent Gaussian diffusion processes (isotropic + nonisotropic) as pytree
table dataclasses with pure jittable methods.

TPU-native re-design of the reference's ``LatentDiffusion`` /
``IsotropicGaussianDiffusion`` / ``NonisotropicGaussianDiffusion``
(`src/core/diffusion/{base,isotropic,nonisotropic}.py`):

* every per-timestep coefficient is precomputed host-side in float64 and
  stored as a float32 device table (reference `base.py:127-134`);
* the ancestral sampler is a single ``lax.scan`` over the T diffusion steps,
  so sampling + conditioning compiles into ONE XLA program (vs the
  reference's Python loop of device launches, `base.py:343-390`);
* the k-sample training fan-out (`base.py:262-268`) is an explicit
  ``jnp.repeat`` along the batch axis so it shards trivially over a data mesh;
* known reference defects are NOT reproduced: the missing
  ``sqrt_recip_alphas_cumprod`` buffer for the nonisotropic pred_noise
  objective (`nonisotropic.py:161-165`) is registered here, and DDIM
  (`base.py:393-396`, dead code upstream) is implemented correctly for the
  isotropic process.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .schedules import compute_covariance_schedules, make_beta_schedule

Array = jnp.ndarray


def extract(a: Array, t: Array, ndim: int) -> Array:
    """Gather per-timestep scalars and broadcast to an ``ndim`` tensor;
    reference `base.py:34-37`.  A SCALAR ``t`` (the sampling scan variable,
    shared across the batch) returns a plain scalar — no per-item gather."""
    t = jnp.asarray(t)
    out = a[t]
    if t.ndim == 0:
        return out
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


def extract_matrix(m: Array, t: Array) -> Array:
    """Gather per-timestep [N,N] (or [N]) tables; reference
    `nonisotropic.py:5-12`.  Scalar ``t`` → single [N,N]/[N] slice."""
    return m[jnp.asarray(t)]


def _f32(x: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x), dtype=jnp.float32)


@struct.dataclass
class IsotropicProcess:
    """DDPM coefficient tables; reference `src/core/diffusion/isotropic.py`."""

    betas: Array
    alphas_cumprod: Array
    alphas_cumprod_prev: Array
    sqrt_alphas_cumprod: Array
    sqrt_one_minus_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array
    sqrt_recipm1_alphas_cumprod: Array
    posterior_variance: Array
    posterior_log_variance_clipped: Array
    posterior_mean_coef1: Array
    posterior_mean_coef2: Array
    loss_weight: Array

    num_timesteps: int = struct.field(pytree_node=False)
    objective: str = struct.field(pytree_node=False)
    loss_type: str = struct.field(pytree_node=False, default="mse")

    # ---- forward process -------------------------------------------------
    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        """Reference `isotropic.py:72-79`."""
        return (
            extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def predict_start_from_noise(self, x_t: Array, t: Array, noise: Array) -> Array:
        return (
            extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def predict_noise_from_start(self, x_t: Array, t: Array, x0: Array) -> Array:
        return (
            extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
        ) / extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def predict_v(self, x_start: Array, t: Array, noise: Array) -> Array:
        return (
            extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * noise
            - extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * x_start
        )

    def predict_start_from_v(self, x_t: Array, t: Array, v: Array) -> Array:
        return (
            extract(self.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(self.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
        )

    # ---- reverse process --------------------------------------------------
    def q_posterior(self, x_start: Array, x_t: Array, t: Array):
        """Reference `isotropic.py:85-92`."""
        mean = (
            extract(self.posterior_mean_coef1, t, x_t.ndim) * x_start
            + extract(self.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        var = extract(self.posterior_variance, t, x_t.ndim)
        log_var = extract(self.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, var, log_var

    def combine_mean_var_noise(self, mean: Array, log_var: Array, noise: Array) -> Array:
        """x_{t-1} = μ + σ·ε; reference `isotropic.py:94-95`."""
        return mean + jnp.exp(0.5 * log_var) * noise

    # ---- loss ---------------------------------------------------------------
    def loss_terms(self, model_out: Array, target: Array, t: Array) -> Array:
        """Elementwise loss; reference `base.py:205-212`."""
        if self.loss_type == "mse":
            return (model_out - target) ** 2
        if self.loss_type == "l1":
            return jnp.abs(model_out - target)
        raise NotImplementedError(self.loss_type)


@struct.dataclass
class NonisotropicProcess:
    """Correlated-noise DDPM over the skeleton graph — the paper's core.

    Tables mirror the buffers of reference
    `src/core/diffusion/nonisotropic.py:72-127`: the forward kernel is
    q(x_t|x_0) = N(√ᾱ_t x_0, U Λ̄_t Uᵀ), the loss is a Mahalanobis L1 in the
    whitened eigenbasis, and the reverse posterior has dense [N,N] mean
    coefficients.
    """

    betas: Array
    alphas_cumprod: Array
    alphas_cumprod_prev: Array
    sqrt_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array  # registered here; missing upstream (`nonisotropic.py:161-165`)
    Lambda_N: Array                   # [N]
    Sigma_N: Array                    # [N,N]
    U: Array                          # [N,N]
    Lambda_t: Array                   # [T,N] per-step eigenvalue schedule (diagnostics)
    Umm_sqrt_Lambda_bar_t: Array                        # [T,N,N]  U·√Λ̄_t
    Umm_sqrt_Lambda_bar_t_sqrt_recip_alphas_cumprod: Array  # [T,N,N]
    inv_sqrt_Lambda_bar_mmUt: Array                     # [T,N,N]  Λ̄_t^{-1/2}·Uᵀ
    inv_sqrt_Lambda_bar_sqrt_alphas_cumprod_mmUt: Array  # [T,N,N]
    posterior_mean_coef1_x0: Array                      # [T,N,N]
    posterior_mean_coef2_xt: Array                      # [T,N,N]
    Lambda_posterior: Array                             # [T,N]
    Lambda_posterior_log_variance_clipped: Array        # [T,N]
    mahalanobis_S_sqrt_recip: Array                     # [T,N,N]
    loss_weight: Array                                  # [T]

    num_timesteps: int = struct.field(pytree_node=False)
    objective: str = struct.field(pytree_node=False)
    loss_reduction_type: str = struct.field(pytree_node=False, default="l1")

    # ---- helpers -------------------------------------------------------------
    def _matmul(self, table: Array, t: Array, x: Array) -> Array:
        """(table[t] @ x): [B,N,N]·[B,N,D]→[B,N,D] for per-item t, or a
        single dense [N,N]·[B,N,D] matmul when t is a scalar (the sampling
        scan shares one t across the batch — no gathered matrices).
        Precision is pinned to HIGHEST: these covariance mixes are tiny
        (N≤51) but parity-critical, and the TPU's default bf16 matmul passes
        would inject ~1e-2 error."""
        mat = extract_matrix(table, t)
        if mat.ndim == 2:
            return jnp.einsum("ij,bjd->bid", mat, x, precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("bij,bjd->bid", mat, x, precision=jax.lax.Precision.HIGHEST)

    def check_eigh(self) -> Array:
        """U Λ_N Uᵀ ≈ Σ_N; reference `nonisotropic.py:139-140`."""
        recon = self.U @ jnp.diag(self.Lambda_N) @ self.U.T
        return jnp.isclose(recon, self.Sigma_N)

    # ---- forward process -------------------------------------------------
    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        """x_t = √ᾱ_t·x_0 + U√Λ̄_t·ε  (white ε); reference
        `nonisotropic.py:152-159`."""
        return (
            extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + self._matmul(self.Umm_sqrt_Lambda_bar_t, t, noise)
        )

    def predict_start_from_noise(self, x_t: Array, t: Array, noise: Array) -> Array:
        """Reference `nonisotropic.py:161-165` (with the missing buffer fixed)."""
        return (
            extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - self._matmul(self.Umm_sqrt_Lambda_bar_t_sqrt_recip_alphas_cumprod, t, noise)
        )

    def predict_noise_from_start(self, x_t: Array, t: Array, x0: Array) -> Array:
        """Reference `nonisotropic.py:167-171`."""
        return self._matmul(self.inv_sqrt_Lambda_bar_mmUt, t, x_t) - self._matmul(
            self.inv_sqrt_Lambda_bar_sqrt_alphas_cumprod_mmUt, t, x0
        )

    # ---- loss -----------------------------------------------------------------
    def loss_terms(self, model_out: Array, target: Array, t: Array) -> Array:
        """Mahalanobis distance |Λ̄_t^{-1/2}Uᵀ(x̂−x)| (L1) or its square;
        reference `nonisotropic.py:177-190` (which flips the difference's
        sign per objective — a no-op under the |·|, not replicated)."""
        difference = model_out - target
        loss = jnp.abs(self._matmul(self.mahalanobis_S_sqrt_recip, t, difference))
        if self.loss_reduction_type == "l1":
            return loss
        if self.loss_reduction_type == "mse":
            return loss**2
        raise NotImplementedError(self.loss_reduction_type)

    # ---- reverse process --------------------------------------------------
    def q_posterior(self, x_start: Array, x_t: Array, t: Array):
        """Reference `nonisotropic.py:196-206`.  Mean is in ambient
        coordinates; (log-)variance is diagonal in the eigenbasis."""
        mean = self._matmul(self.posterior_mean_coef1_x0, t, x_start) + self._matmul(
            self.posterior_mean_coef2_xt, t, x_t
        )
        var = extract_matrix(self.Lambda_posterior, t)[..., None]
        log_var = extract_matrix(self.Lambda_posterior_log_variance_clipped, t)[..., None]
        return mean, var, log_var

    def combine_mean_var_noise(self, mean: Array, log_var: Array, noise: Array) -> Array:
        """x_{t-1} = μ + U(e^{½logΛ_post}·ε); reference
        `nonisotropic.py:208-210`."""
        return mean + jnp.einsum(
            "ij,bjd->bid", self.U, jnp.exp(0.5 * log_var) * noise,
            precision=jax.lax.Precision.HIGHEST,
        )

    def posterior_step_tables(self) -> Array:
        """[T, N, 3N] per-step matrices [P1_t | P2_t | U·diag(e^{½logΛ_t})]
        for the fused sampling-step kernel (`ops/pallas/posterior_step.py`):
        x_{t-1} = P1_t·clip(x̂₀) + P2_t·x_t + Uσ_t·ε.  The noise block is
        zeroed at t=0 (the reference's ``t > 0`` mask, `base.py:353`)."""
        sigma = jnp.exp(0.5 * self.Lambda_posterior_log_variance_clipped)  # [T,N]
        u_sigma = self.U[None, :, :] * sigma[:, None, :]  # U·diag(σ_t)
        u_sigma = u_sigma.at[0].set(0.0)
        return jnp.concatenate(
            [self.posterior_mean_coef1_x0, self.posterior_mean_coef2_xt, u_sigma],
            axis=-1,
        )


def build_isotropic_process(
    timesteps: int = 10,
    objective: str = "pred_x0",
    beta_schedule: str = "cosine",
    beta_schedule_factor: float = 3.0,
    loss_type: str = "mse",
) -> IsotropicProcess:
    """Float64 host precompute of all tables; reference
    `base.py:103-134` + `isotropic.py:7-42`."""
    betas = make_beta_schedule(beta_schedule, timesteps, beta_schedule_factor)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    snr = alphas_cumprod / (1 - alphas_cumprod)
    if objective == "pred_noise":
        loss_weight = np.ones_like(snr)
    elif objective == "pred_x0":
        loss_weight = snr
    elif objective == "pred_v":
        loss_weight = snr / (snr + 1)
    else:
        raise ValueError(objective)

    return IsotropicProcess(
        betas=_f32(betas),
        alphas_cumprod=_f32(alphas_cumprod),
        alphas_cumprod_prev=_f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=_f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=_f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=_f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=_f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=_f32(posterior_variance),
        posterior_log_variance_clipped=_f32(np.log(np.clip(posterior_variance, 1e-20, None))),
        posterior_mean_coef1=_f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=_f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
        loss_weight=_f32(loss_weight),
        num_timesteps=timesteps,
        objective=objective,
        loss_type=loss_type,
    )


def build_nonisotropic_process(
    Sigma_N: np.ndarray,
    Lambda_N: np.ndarray,
    U: np.ndarray,
    timesteps: int = 10,
    objective: str = "pred_x0",
    beta_schedule: str = "cosine",
    beta_schedule_factor: float = 3.0,
    diffusion_covariance_type: str = "skeleton-diffusion",
    gamma_scheduler: str = "cosine",
    loss_reduction_type: str = "l1",
) -> NonisotropicProcess:
    """Float64 host precompute of every [T,N]/[T,N,N] buffer; reference
    `nonisotropic.py:72-127`."""
    Sigma_N = np.asarray(Sigma_N, dtype=np.float64)
    Lambda_N = np.asarray(Lambda_N, dtype=np.float64)
    U = np.asarray(U, dtype=np.float64)

    betas = make_beta_schedule(beta_schedule, timesteps, beta_schedule_factor)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    sqrt_alphas_cumprod = np.sqrt(alphas_cumprod)

    Lambda_t, Lambda_bar_t, Lambda_bar_t_prev = compute_covariance_schedules(
        betas, Lambda_N, diffusion_covariance_type, gamma_scheduler
    )
    # broadcast [T,1] isotropic-ablation schedules up to [T,N]
    N = Sigma_N.shape[0]
    Lambda_t = np.broadcast_to(Lambda_t, (timesteps, N)).copy()
    Lambda_bar_t = np.broadcast_to(Lambda_bar_t, (timesteps, N)).copy()
    Lambda_bar_t_prev = np.broadcast_to(Lambda_bar_t_prev, (timesteps, N)).copy()

    Ut = U.T[None]  # [1,N,N]

    # forward-process buffers (`nonisotropic.py:89-99`)
    inv_sqrt_Lambda_bar = 1.0 / np.sqrt(Lambda_bar_t)                       # [T,N]
    inv_sqrt_Lb_mmUt = inv_sqrt_Lambda_bar[..., None] * Ut                  # diag·Uᵀ
    inv_sqrt_Lb_sqrt_ac_mmUt = (inv_sqrt_Lambda_bar * sqrt_alphas_cumprod[:, None])[..., None] * Ut
    sqrt_Lambda_bar = np.sqrt(Lambda_bar_t)
    Umm_sqrt_Lb = U[None] * sqrt_Lambda_bar[:, None, :]                     # U·diag
    Umm_sqrt_Lb_sqrt_recip_ac = U[None] * np.sqrt(Lambda_bar_t / alphas_cumprod[:, None])[:, None, :]

    # posterior buffers (`nonisotropic.py:101-111`)
    Lambda_posterior_t = Lambda_t * Lambda_bar_t_prev / Lambda_bar_t
    def u_diag_ut(diag):  # U diag(v) Uᵀ per timestep
        return np.einsum("ij,tj,kj->tik", U, diag, U)
    coef1 = np.sqrt(alphas_cumprod_prev)[:, None, None] * u_diag_ut(Lambda_t / Lambda_bar_t)
    coef2 = np.sqrt(alphas)[:, None, None] * u_diag_ut(Lambda_bar_t_prev / Lambda_bar_t)

    # loss buffers (`nonisotropic.py:113-125`)
    mahalanobis = np.sqrt(1.0 / Lambda_bar_t)[..., None] * Ut
    if objective == "pred_noise":
        loss_weight = np.ones_like(alphas)
    elif objective == "pred_x0":
        loss_weight = alphas_cumprod
    else:
        raise NotImplementedError(f"objective={objective} for nonisotropic diffusion")

    return NonisotropicProcess(
        betas=_f32(betas),
        alphas_cumprod=_f32(alphas_cumprod),
        alphas_cumprod_prev=_f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=_f32(sqrt_alphas_cumprod),
        sqrt_recip_alphas_cumprod=_f32(np.sqrt(1.0 / alphas_cumprod)),
        Lambda_N=_f32(Lambda_N),
        Sigma_N=_f32(Sigma_N),
        U=_f32(U),
        Lambda_t=_f32(Lambda_t),
        Umm_sqrt_Lambda_bar_t=_f32(Umm_sqrt_Lb),
        Umm_sqrt_Lambda_bar_t_sqrt_recip_alphas_cumprod=_f32(Umm_sqrt_Lb_sqrt_recip_ac),
        inv_sqrt_Lambda_bar_mmUt=_f32(inv_sqrt_Lb_mmUt),
        inv_sqrt_Lambda_bar_sqrt_alphas_cumprod_mmUt=_f32(inv_sqrt_Lb_sqrt_ac_mmUt),
        posterior_mean_coef1_x0=_f32(coef1),
        posterior_mean_coef2_xt=_f32(coef2),
        Lambda_posterior=_f32(Lambda_posterior_t),
        Lambda_posterior_log_variance_clipped=_f32(np.log(np.clip(Lambda_posterior_t, 1e-20, None))),
        mahalanobis_S_sqrt_recip=_f32(mahalanobis),
        loss_weight=_f32(loss_weight),
        num_timesteps=timesteps,
        objective=objective,
        loss_reduction_type=loss_reduction_type,
    )
