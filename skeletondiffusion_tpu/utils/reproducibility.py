"""Determinism utilities.

JAX's explicit PRNG keys give reproducibility by construction (the
reference needs global seeding + deterministic-algorithms flags +
RNG-state checkpointing, `src/utils/reproducibility.py:9-79`).  What remains
here: a single entry point turning a config seed into the root key, the
per-epoch reseed fold (mirroring `train_diffusion.py:70-72`), and numpy
seeding for the host-side data pipeline.
"""
from __future__ import annotations

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host-side numpy (data order/augmentation jitter) and return the
    root PRNG key."""
    np.random.seed(seed)
    return jax.random.key(seed)


def epoch_key(root: jax.Array, epoch: int) -> jax.Array:
    """Per-epoch reseed semantics (reference reseeds with seed+epoch at every
    EPOCH_STARTED, `train_diffusion.py:70-72`)."""
    return jax.random.fold_in(root, epoch)


def iteration_key(epoch_k: jax.Array, iteration: int) -> jax.Array:
    return jax.random.fold_in(epoch_k, iteration)
