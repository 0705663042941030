"""Latent diffusion processes with skeleton-correlated (nonisotropic) noise.

Public API mirrors the reference's plug-and-play surface (README.md:72-98):
``get_cov_from_corr`` + a process builder + ``GaussianDiffusion`` engine with
``loss(...)`` / ``sample(...)``.
"""
from .covariance import (
    dim_null_space,
    get_cov_from_corr,
    is_positive_def,
    make_positive_definite,
    normalize_cov,
)
from .engine import GaussianDiffusion
from .process import (
    IsotropicProcess,
    NonisotropicProcess,
    build_isotropic_process,
    build_nonisotropic_process,
    extract,
    extract_matrix,
)
from .schedules import (
    compute_covariance_schedules,
    cosine_beta_schedule,
    exp_beta_schedule,
    linear_beta_schedule,
    make_beta_schedule,
)

__all__ = [
    "GaussianDiffusion",
    "IsotropicProcess",
    "NonisotropicProcess",
    "build_isotropic_process",
    "build_nonisotropic_process",
    "compute_covariance_schedules",
    "cosine_beta_schedule",
    "dim_null_space",
    "exp_beta_schedule",
    "extract",
    "extract_matrix",
    "get_cov_from_corr",
    "is_positive_def",
    "linear_beta_schedule",
    "make_beta_schedule",
    "make_positive_definite",
    "normalize_cov",
]
