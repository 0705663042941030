"""skeletondiffusion_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of tum-vision/skeletondiffusion (CVPR 2025).

Built from scratch for TPU hardware: functional core over parameter pytrees,
``lax.scan`` for every sequential loop, precomputed float64→float32 schedule and
covariance tables, data-parallel sharding over a ``jax.sharding.Mesh``, and
Orbax checkpointing.  The public surface mirrors the reference implementation's
API shapes (see SURVEY.md §3.4): ``Denoiser``, ``get_cov_from_corr``,
``NonisotropicGaussianDiffusion``-equivalent process objects with
``diffusion.loss(...)`` / ``diffusion.sample(...)``, the two-stage trainers,
and the ``eval`` metric suite.
"""

__version__ = "0.1.0"
