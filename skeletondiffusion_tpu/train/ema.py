"""Exponential moving average of a parameter pytree, matching the semantics
of the ``ema_pytorch.EMA`` wrapper the reference trains with
(`src/core/trainer.py:157-160`): warmup-gated decay
``1 − (1 + step/inv_gamma)^(−power)`` clamped to [min_value, beta], updates
every ``update_every`` steps, hard-copy before ``update_after_step``.

Implemented branch-free so the update fuses into the jitted train step.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any      # EMA parameter pytree
    step: jnp.ndarray  # int32 scalar — counts update() calls


def ema_init(params) -> EMAState:
    # jnp.array (copy=True) — the EMA tree must NOT alias the live params,
    # otherwise buffer donation of a train state containing both fails with
    # "Attempt to donate the same buffer twice"
    return EMAState(
        params=jax.tree.map(lambda p: jnp.array(p), params), step=jnp.asarray(0, jnp.int32)
    )


def ema_update(
    state: EMAState,
    params,
    *,
    beta: float = 0.995,
    update_every: int = 10,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> EMAState:
    """One ``EMA.update()`` call.  Decay schedule per ema_pytorch:

    * step % update_every != 0 → no-op (effective decay 1)
    * step ≤ update_after_step → hard copy (decay 0)
    * else decay = clamp(1 − (1+epoch/inv_gamma)^(−power), min_value, beta),
      epoch = step − update_after_step − 1 (copy while epoch ≤ 0)
    """
    step = state.step
    epoch = jnp.clip(step.astype(jnp.float32) - update_after_step - 1, 0.0, None)
    value = 1.0 - (1.0 + epoch / inv_gamma) ** (-power)
    decay = jnp.where(epoch <= 0, 0.0, jnp.clip(value, min_value, beta))
    is_update = (step % update_every) == 0
    hard_copy = step <= update_after_step
    decay = jnp.where(hard_copy, 0.0, decay)
    eff = jnp.where(is_update, decay, 1.0)

    new_params = jax.tree.map(lambda e, p: eff * e + (1.0 - eff) * p, state.params, params)
    return EMAState(params=new_params, step=step + 1)
