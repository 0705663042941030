"""Parameter initializers matching the reference's torch init semantics so
training dynamics are comparable (the reference's checkpoints were trained
with these scales).

* ``graph_linear_weight``: kaiming_uniform(a=√5) on a [types,out,in] tensor →
  bound 1/√fan_in where torch computes fan_in = shape[1]·shape[2] = out·in for
  3D weight banks (`src/core/network/layers/graph_structural.py:17-28`), then
  ties all type banks to bank 0 (`graph_structural.py:23-24`).
* ``uniform_stdv``: U(−1/√H, 1/√H), the recurrent-cell init
  (`src/core/network/layers/recurrent.py:310-319`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def graph_linear_weight(num_types: int, in_features: int, out_features: int, tie_types: bool = True):
    """Returns an init fn producing [num_types, in, out] (JAX x@W layout)."""

    def init(key, shape=None, dtype=jnp.float32):
        fan_in = out_features * in_features if num_types > 1 or tie_types else in_features
        bound = 1.0 / jnp.sqrt(fan_in)
        w = jax.random.uniform(
            key, (num_types, in_features, out_features), dtype, minval=-bound, maxval=bound
        )
        if tie_types:
            w = jnp.broadcast_to(w[0:1], w.shape)
        return w

    return init


def graph_linear_bias(num_types: int, in_features: int, out_features: int):
    """U(−1/√fan_in, 1/√fan_in) with torch's 3D fan_in = out·in
    (`graph_structural.py:25-28`)."""

    def init(key, shape=None, dtype=jnp.float32):
        fan_in = out_features * in_features
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, (num_types, out_features), dtype, minval=-bound, maxval=bound)

    return init


def uniform_stdv(hidden_size: int):
    """U(−1/√H, 1/√H); reference `recurrent.py:310-319`."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(hidden_size)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_linear_weight(in_features: int):
    """torch nn.Linear default (kaiming_uniform a=√5 → U(±1/√in)) for the
    plain Linear layers in time MLPs (`nn/generator.py:50-55`)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(in_features)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
