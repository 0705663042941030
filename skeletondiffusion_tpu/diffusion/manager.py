"""Diffusion factory: skeleton graph → covariance → process + Denoiser +
engine; reference `src/core/diffusion_manager.py:8-45` (``DiffusionManager``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..models.denoiser import Denoiser
from .covariance import get_cov_from_corr
from .engine import GaussianDiffusion
from .process import build_isotropic_process, build_nonisotropic_process


def build_denoiser(
    num_nodes: int,
    diffusion_conditioning: bool = False,
    latent_size: int = 96,
    node_types: Optional[np.ndarray] = None,
    diffusion_arch: Optional[Dict[str, Any]] = None,
    compute_dtype: Optional[str] = None,
    **kwargs,
) -> Denoiser:
    """Reference `diffusion_manager.py:36-45` (``get_network``)."""
    arch = dict(diffusion_arch or {})
    arch.pop("arch", None)
    cond_dim = latent_size if diffusion_conditioning else 0
    norm_type = arch.pop("norm_type", "none")
    assert norm_type == "none", "only norm_type='none' is shipped in reference configs"
    return Denoiser(
        dim=latent_size,
        cond_dim=cond_dim,
        out_dim=latent_size,
        channels=num_nodes,
        node_types=node_types,
        compute_dtype=compute_dtype,
        **arch,
    )


def create_diffusion(
    skeleton,
    diffusion_type: str = "IsotropicGaussianDiffusion",
    covariance_matrix_type: str = "adjacency",
    reachability_matrix_degree_factor: float = 0.5,
    reachability_matrix_stop_at=0,
    if_sigma_n_scale: bool = True,
    sigma_n_scale: str = "spectral",
    if_run_as_isotropic: bool = False,
    latent_size: int = 96,
    diffusion_conditioning: bool = False,
    diffusion_timesteps: int = 10,
    diffusion_objective: str = "pred_x0",
    beta_schedule: str = "cosine",
    beta_schedule_factor: float = 3.0,
    diffusion_covariance_type: str = "skeleton-diffusion",
    gamma_scheduler: str = "cosine",
    loss_reduction_type: str = "l1",
    diffusion_loss_type: str = "mse",
    diffusion_activation: str = "identity",
    diffusion_arch: Optional[Dict[str, Any]] = None,
    sampling_timesteps: Optional[int] = None,
    ddim_sampling_eta: float = 0.0,
    compute_dtype: Optional[str] = None,
    remat_denoiser: bool = False,
    **kwargs,
) -> Tuple[GaussianDiffusion, Denoiser]:
    """Build (engine, denoiser module); reference
    `diffusion_manager.py:8-31`.  ``compute_dtype='bfloat16'`` runs the
    denoiser's internals in reduced precision (params/outputs fp32).

    ``remat_denoiser`` (TPU memory lever, no reference counterpart): wrap
    the denoiser forward in ``jax.checkpoint`` so the backward pass
    rematerializes its internals instead of keeping every layer activation
    of the k-fan-out batch alive — gradients are bit-identical (remat is
    exact), peak HBM drops for batch ≥128 stage-2 training at the cost of
    one extra denoiser forward in the backward."""
    num_nodes = skeleton.num_nodes
    node_types = skeleton.nodes_type_id
    model = build_denoiser(
        num_nodes=num_nodes,
        diffusion_conditioning=diffusion_conditioning,
        latent_size=latent_size,
        node_types=node_types,
        diffusion_arch=diffusion_arch,
        compute_dtype=compute_dtype,
    )

    if diffusion_type == "NonisotropicGaussianDiffusion":
        if covariance_matrix_type == "adjacency":
            corr = skeleton.adj_matrix
        elif covariance_matrix_type == "reachability":
            corr = skeleton.reachability_matrix(
                factor=reachability_matrix_degree_factor, stop_at=reachability_matrix_stop_at
            )
        else:
            raise NotImplementedError(covariance_matrix_type)
        Sigma_N, Lambda_N, U = get_cov_from_corr(
            correlation_matrix=corr,
            if_sigma_n_scale=if_sigma_n_scale,
            sigma_n_scale=sigma_n_scale,
            if_run_as_isotropic=if_run_as_isotropic,
            diffusion_covariance_type=diffusion_covariance_type,
        )
        process = build_nonisotropic_process(
            Sigma_N, Lambda_N, U,
            timesteps=diffusion_timesteps,
            objective=diffusion_objective,
            beta_schedule=beta_schedule,
            beta_schedule_factor=beta_schedule_factor,
            diffusion_covariance_type=diffusion_covariance_type,
            gamma_scheduler=gamma_scheduler,
            loss_reduction_type=loss_reduction_type,
        )
    elif diffusion_type == "IsotropicGaussianDiffusion":
        if diffusion_loss_type not in ("mse", "l1"):
            # every other enum here raises on unknown values — a typo'd
            # loss type must not silently train with a different loss
            raise NotImplementedError(
                f"isotropic diffusion_loss_type={diffusion_loss_type!r} (use 'mse' or 'l1')"
            )
        process = build_isotropic_process(
            timesteps=diffusion_timesteps,
            objective=diffusion_objective,
            beta_schedule=beta_schedule,
            beta_schedule_factor=beta_schedule_factor,
            loss_type=diffusion_loss_type,
        )
    else:
        raise NotImplementedError(diffusion_type)

    arch = diffusion_arch or {}
    can_hoist_cond = (
        diffusion_conditioning
        and not arch.get("self_condition", False)
        and getattr(model, "node_major", True)
    )
    _maybe_remat = jax.checkpoint if remat_denoiser else (lambda f: f)
    engine = GaussianDiffusion(
        process,
        _maybe_remat(lambda params, x, t, x_cond: model.apply(params, x, t, x_cond)),
        channels=num_nodes,
        latent_size=latent_size,
        diffusion_activation=diffusion_activation,
        diffusion_conditioning=diffusion_conditioning,
        sampling_timesteps=sampling_timesteps,
        ddim_sampling_eta=ddim_sampling_eta,
        cond_embed=(
            (lambda params, xc: model.apply(params, xc, method=Denoiser.cond_embedding))
            if can_hoist_cond else None
        ),
        model_apply_ucond=(
            _maybe_remat(lambda params, x, t, u: model.apply(params, x, t, u_cond=u))
            if can_hoist_cond else None
        ),
    )
    # expose the module so eval-time fast paths (fused Pallas denoiser,
    # ops/pallas/denoiser_fused.py) can rebind model_apply_ucond
    engine.denoiser_module = model
    return engine, model
