"""Attention over the joint axis + FiLM'd graph-linear blocks — the denoiser's
building blocks.

Mirrors reference `src/core/network/layers/attention.py`: attention similarity
is computed ACROSS SKELETON NODES (einsum 'bhcn,bhcj->bhnj' — queries/keys are
per-node feature columns, `attention.py:122-136`), with graph-linear qkv/out
projections.  With N ≤ 51 nodes the whole attention fits in VMEM; XLA fuses
the softmax chain, so the win on TPU is batching, not sharding (SURVEY.md §5
long-context note).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .graph_linear import StaticGraphLinear
from .initializers import torch_linear_weight

Array = jnp.ndarray


class RMSNorm(nn.Module):
    """x/‖x‖₂ · g · √dim over the last axis; reference `attention.py:30-36`
    (torch F.normalize semantics: ε=1e-12 clamp on the norm)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.param("g", nn.initializers.ones, (1, 1, self.dim))
        norm = jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12, None)
        return x / norm * g * (self.dim**0.5)


class Attention(nn.Module):
    """Multi-head attention across the node axis; reference
    `attention.py:105-136`."""

    dim: int
    num_nodes: int
    heads: int = 4
    dim_head: int = 32
    dim_out: Optional[int] = None
    node_types: Optional[np.ndarray] = None
    learn_influence: bool = False
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, c = x.shape
        hidden = self.dim_head * self.heads
        dim_out = self.dim_out if self.dim_out is not None else self.dim

        qkv = StaticGraphLinear(
            self.dim, hidden * 3, num_nodes=self.num_nodes, node_types=self.node_types,
            learn_influence=self.learn_influence, use_bias=self.qkv_bias, name="to_qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # 'b n (h c) -> b h c n'
        reshape = lambda t: jnp.transpose(t.reshape(b, n, self.heads, self.dim_head), (0, 2, 3, 1))
        q, k, v = reshape(q), reshape(k), reshape(v)

        q = q * (self.dim_head**-0.5)
        sim = jnp.einsum("bhcn,bhcj->bhnj", q, k)      # node×node similarity
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnj,bhdj->bhnd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, hidden)  # 'b h n d -> b n (h d)'

        return StaticGraphLinear(
            hidden, dim_out, num_nodes=self.num_nodes, node_types=self.node_types,
            learn_influence=self.learn_influence, use_bias=False, name="to_out",
        )(out)


class PreNormAttentionResidual(nn.Module):
    """Residual(PreNorm(Attention)) — the reference composes tiny wrapper
    modules (`attention.py:11-17,38-46`); fused into one module here."""

    dim: int
    num_nodes: int
    heads: int = 4
    dim_head: int = 32
    node_types: Optional[np.ndarray] = None
    learn_influence: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = RMSNorm(self.dim, name="norm")(x)
        h = Attention(
            dim=self.dim, num_nodes=self.num_nodes, heads=self.heads, dim_head=self.dim_head,
            node_types=self.node_types, learn_influence=self.learn_influence, name="attn",
        )(h)
        return h + x


class Block(nn.Module):
    """graph-linear → (identity norm) → FiLM scale/shift → tanh; reference
    `attention.py:49-75` (norm_type='none' in every shipped config)."""

    dim: int
    dim_out: int
    num_nodes: int
    node_types: Optional[np.ndarray] = None
    learn_influence: bool = False

    @nn.compact
    def __call__(self, x: Array, scale_shift=None) -> Array:
        x = StaticGraphLinear(
            self.dim, self.dim_out, num_nodes=self.num_nodes, node_types=self.node_types,
            learn_influence=self.learn_influence, name="proj",
        )(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return jnp.tanh(x)


class ResnetBlock(nn.Module):
    """Two FiLM'd blocks + graph-linear residual; reference
    `attention.py:78-102`."""

    dim: int
    dim_out: int
    num_nodes: int
    time_emb_dim: Optional[int] = None
    node_types: Optional[np.ndarray] = None
    learn_influence: bool = False

    @nn.compact
    def __call__(self, x: Array, time_emb: Optional[Array] = None) -> Array:
        scale_shift = None
        if self.time_emb_dim is not None and time_emb is not None:
            t = jnp.tanh(time_emb)
            t = nn.Dense(
                self.dim_out * 2,
                kernel_init=torch_linear_weight(self.time_emb_dim),
                bias_init=torch_linear_weight(self.time_emb_dim),
                name="mlp",
            )(t)
            t = t[:, None, :]  # 'b c -> b 1 c'
            scale_shift = jnp.split(t, 2, axis=-1)

        h = Block(self.dim, self.dim_out, num_nodes=self.num_nodes,
                  node_types=self.node_types, learn_influence=self.learn_influence,
                  name="block1")(x, scale_shift=scale_shift)
        h = Block(self.dim_out, self.dim_out, num_nodes=self.num_nodes,
                  node_types=self.node_types, learn_influence=self.learn_influence,
                  name="block2")(h)

        if self.dim != self.dim_out:
            res = StaticGraphLinear(
                self.dim, self.dim_out, num_nodes=self.num_nodes, node_types=self.node_types,
                learn_influence=self.learn_influence, use_bias=False, name="res_linear",
            )(x)
        else:
            res = x
        return h + res


def sinusoidal_pos_emb(t: Array, dim: int, theta: float = 10000.0) -> Array:
    """lucidrains 1D sinusoidal time embedding (imported by reference
    `nn/generator.py:3,47`)."""
    half_dim = dim // 2
    emb = jnp.log(theta) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim) * -emb)
    emb = t.astype(jnp.float32)[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
