"""Attention over the joint axis + FiLM'd graph-linear blocks — the denoiser's
building blocks.

Mirrors reference `src/core/network/layers/attention.py`: attention similarity
is computed ACROSS SKELETON NODES (einsum 'bhcn,bhcj->bhnj' — queries/keys are
per-node feature columns, `attention.py:122-136`), with graph-linear qkv/out
projections.

TPU layout design: all modules support ``node_major`` activations [N,B,F]
(see ``graph_linear.gmm_nm``), and the attention einsums keep heads/channels
in TRAILING axes — the reference's 'b n (h c) -> b h c n' rearrange forces
XLA to materialize [B, H·C, N]-layout copies of the 0.8 GB qkv tensors
(measured: 42 such transposes per denoiser forward before this change).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .graph_linear import StaticGraphLinear
from .initializers import torch_linear_weight

Array = jnp.ndarray


class RMSNorm(nn.Module):
    """x/‖x‖₂ · g · √dim over the last axis; reference `attention.py:30-36`
    (torch F.normalize semantics: ε=1e-12 clamp on the norm).  Layout
    agnostic (normalizes the trailing feature axis)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.param("g", nn.initializers.ones, (1, 1, self.dim))
        norm = jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12, None)
        return x / norm * g.reshape(1, 1, self.dim) * (self.dim**0.5)


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
    node_major: bool = False
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = self.dim_head * self.heads
        dim_out = self.dim_out if self.dim_out is not None else self.dim

        qkv = StaticGraphLinear(
            self.dim, hidden * 3, num_nodes=self.num_nodes, node_types=self.node_types,
            learn_influence=self.learn_influence, use_bias=self.qkv_bias,
            node_major=self.node_major, compute_dtype=self.compute_dtype, name="to_qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.node_major:
            n, b = x.shape[0], x.shape[1]
            # [N,B,H·C] → [N,B,h,c]: reshape only, no transpose
            shape4 = (n, b, self.heads, self.dim_head)
            q = q.reshape(shape4) * (self.dim_head**-0.5)
            k = k.reshape(shape4)
            v = v.reshape(shape4)
            sim = jnp.einsum("nbhc,mbhc->bhnm", q, k)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhnm,mbhc->nbhc", attn, v).reshape(n, b, hidden)
        else:
            b, n = x.shape[0], x.shape[1]
            shape4 = (b, n, self.heads, self.dim_head)
            q = q.reshape(shape4) * (self.dim_head**-0.5)
            k = k.reshape(shape4)
            v = v.reshape(shape4)
            sim = jnp.einsum("bnhc,bmhc->bhnm", q, k)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhnm,bmhc->bnhc", attn, v).reshape(b, n, hidden)

        return StaticGraphLinear(
            hidden, dim_out, num_nodes=self.num_nodes, node_types=self.node_types,
            learn_influence=self.learn_influence, use_bias=False,
            node_major=self.node_major, compute_dtype=self.compute_dtype, name="to_out",
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
    node_major: bool = False
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = RMSNorm(self.dim, name="norm")(x)
        h = Attention(
            dim=self.dim, num_nodes=self.num_nodes, heads=self.heads, dim_head=self.dim_head,
            node_types=self.node_types, learn_influence=self.learn_influence,
            node_major=self.node_major, compute_dtype=self.compute_dtype, name="attn",
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
    node_major: bool = False
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: Array, scale_shift=None) -> Array:
        x = StaticGraphLinear(
            self.dim, self.dim_out, num_nodes=self.num_nodes, node_types=self.node_types,
            learn_influence=self.learn_influence, node_major=self.node_major,
            compute_dtype=self.compute_dtype, name="proj",
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
    node_major: bool = False
    compute_dtype: str = None

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
            # broadcast over the node axis: [B,C] → [1,B,C] (node-major) or
            # [B,1,C] (batch-major); reference 'b c -> b 1 c'
            t = t[None, :, :] if self.node_major else t[:, None, :]
            if self.compute_dtype:
                t = t.astype(jnp.dtype(self.compute_dtype))
            scale_shift = jnp.split(t, 2, axis=-1)

        common = dict(num_nodes=self.num_nodes, node_types=self.node_types,
                      learn_influence=self.learn_influence, node_major=self.node_major,
                      compute_dtype=self.compute_dtype)
        h = Block(self.dim, self.dim_out, name="block1", **common)(x, scale_shift=scale_shift)
        h = Block(self.dim_out, self.dim_out, name="block2", **common)(h)

        if self.dim != self.dim_out:
            res = StaticGraphLinear(
                self.dim, self.dim_out, use_bias=False, name="res_linear", **common
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
