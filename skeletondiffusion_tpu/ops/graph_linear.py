"""Graph-structural linear layer: per-node-type weight banks mixed across the
skeleton by a (learnable, row-L1-normalized) influence matrix G.

TPU-native formulation of the reference's ``StaticGraphLinear``
(`src/core/network/layers/graph_structural.py:7-114`):

    y = G · (gmm(x, W[type]) + b[type]),   gmm = einsum('bni,nio->bno', x, W_n)

The node-type gather ``W[type_index]`` is resolved at trace time (static
indices), so XLA sees one dense [N,in,out] einsum — a batched matmul that
tiles directly onto the MXU — followed by the tiny [N,N] mix.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .initializers import graph_linear_bias, graph_linear_weight

Array = jnp.ndarray


def l1_normalize_rows(g: Array, eps: float = 1e-12) -> Array:
    """torch F.normalize(p=1, dim=1): divide each row by max(‖row‖₁, eps)
    (`graph_structural.py:30-32`).

    ``g * sign(g)`` instead of ``abs(g)``: same value, but its gradient is
    ``sign(g)`` with sign(0)=0 — torch's abs subgradient.  jnp.abs picks
    subgradient 1 at 0, and EVERY off-diagonal entry of a fresh
    identity-initialized G sits exactly at that kink, so the choice changes
    the whole G gradient at init (verified vs finite differences, which side
    with torch); training trajectories would diverge from the reference's
    from step one."""
    abs_g = g * jnp.sign(g)
    norm = jnp.clip(jnp.sum(abs_g, axis=1, keepdims=True), eps, None)
    return g / norm


def gmm(x: Array, w: Array) -> Array:
    """Per-node matmul; reference `graph_structural.py:7-8` (with the weight
    pre-transposed to [N,in,out])."""
    return jnp.einsum("bni,nio->bno", x, w)


def gmm_nm(x: Array, w: Array) -> Array:
    """Node-major per-node matmul: [N,B,i]·[N,i,o]→[N,B,o].

    TPU layout note: with the node axis LEADING on both operands this lowers
    to a clean batched dot_general with zero transposes; the [B,N,F]-major
    form forces XLA to materialize [N,F,B]-layout copies of every activation
    (measured 162 GB of HBM traffic per denoiser forward before this
    change)."""
    return jnp.einsum("nbi,nio->nbo", x, w)


def gmix_nm(g: Array, x: Array) -> Array:
    """Influence mix in node-major layout: [N,N]·[N,B,F]→[N,B,F] — a single
    [N, B·F] matmul, no transposes."""
    return jnp.einsum("nm,mbf->nbf", g, x)


class StaticGraphLinear(nn.Module):
    """Reference `graph_structural.py:58-114`.

    Attributes:
        in_features/out_features: feature sizes.
        num_nodes: number of skeleton nodes N.
        node_types: optional [N] int array; nodes of the same type share a
            weight bank (L/R mirror joints).  None → one shared bank.
        learn_influence: learn G (init = I, row-L1-normalized at each use).
        bias: learn an additive bias.
        node_major: input/output layout [N,B,F] instead of [B,N,F] — the
            TPU-efficient internal layout (see ``gmm_nm``).
    """

    in_features: int
    out_features: int
    num_nodes: int
    node_types: Optional[np.ndarray] = None
    learn_influence: bool = False
    use_bias: bool = True
    node_major: bool = False
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16'; params stay fp32

    @nn.compact
    def __call__(
        self,
        x: Array,
        g: Optional[Array] = None,
        mode: str = "full",
        input_offset: int = 0,
        partial_in: Optional[Array] = None,
    ) -> Array:
        """``mode='partial'`` returns only the weight product of an input
        SLICE (columns ``input_offset:input_offset+x.shape[-1]``) without
        bias/G — used to hoist loop-invariant inputs (e.g. the diffusion
        conditioning) out of sampling loops; the hoisted product re-enters a
        later 'full' call via ``partial_in``."""
        n_types = 1 if self.node_types is None else int(np.max(self.node_types)) + 1
        type_index = (
            np.zeros(self.num_nodes, dtype=np.int32)
            if self.node_types is None
            else np.asarray(self.node_types, dtype=np.int32)
        )

        weight = self.param(
            "weight", graph_linear_weight(n_types, self.in_features, self.out_features)
        )
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if cdt is not None:
            weight = weight.astype(cdt)
            x = x.astype(cdt)
        if input_offset or x.shape[-1] != self.in_features:
            weight = weight[:, input_offset : input_offset + x.shape[-1], :]
        if mode == "partial":
            assert self.node_major, "partial mode is used on the node-major fast path"
            return gmm_nm(x, weight[type_index])
        if g is None:
            if self.learn_influence:
                G = self.param("G", lambda key: jnp.eye(self.num_nodes, dtype=jnp.float32))
                g = l1_normalize_rows(G)
            else:
                g = jnp.eye(self.num_nodes, dtype=x.dtype)
        if cdt is not None:
            g = g.astype(cdt)

        if self.node_major:
            out = gmm_nm(x, weight[type_index])
            if partial_in is not None:
                out = out + partial_in.astype(out.dtype)
            if self.use_bias:
                bias = self.param(
                    "bias", graph_linear_bias(n_types, self.in_features, self.out_features)
                )
                if cdt is not None:
                    bias = bias.astype(cdt)
                out = out + bias[type_index][:, None, :]
            return gmix_nm(g, out)

        out = gmm(x, weight[type_index])
        if self.use_bias:
            bias = self.param("bias", graph_linear_bias(n_types, self.in_features, self.out_features))
            if cdt is not None:
                bias = bias.astype(cdt)
            out = out + bias[type_index]
        return jnp.einsum("nm,bmo->bno", g, out)


class DynamicGraphLinear(nn.Module):
    """Graph linear whose influence matrix is selected PER CALL: either an
    explicit ``g`` or a sub-graph ``G[t][:, t]`` of the learnable full-size
    influence matrix indexed by a node-id vector ``t``; reference
    `graph_structural.py:46-54`.  No shipped config or checkpoint uses it
    (zero call sites upstream) — provided for API completeness.
    """

    in_features: int
    out_features: int
    max_nodes: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, g: Optional[Array] = None, t: Optional[Array] = None) -> Array:
        assert g is not None or t is not None, (
            "Either Graph Influence Matrix or Node Type Vector is needed"
        )
        weight = self.param(
            "weight", graph_linear_weight(1, self.in_features, self.out_features)
        )[0]
        G = self.param("G", lambda key: jnp.eye(self.max_nodes, dtype=jnp.float32))
        if g is None:
            t = jnp.asarray(t)
            g = G[t][:, t]
        out = x @ weight
        if self.use_bias:
            bias = self.param(
                "bias", graph_linear_bias(1, self.in_features, self.out_features)
            )[0]
            out = out + bias
        return jnp.einsum("nm,bmo->bno", g, out)
