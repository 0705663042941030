"""Graph-recurrent cells (GRU / LSTM) where gate pre-activations are mixed
across skeleton joints by the influence matrix G each step.

TPU-native re-design of the reference's hand-rolled cells
(`src/core/network/layers/recurrent.py:208-402`): the per-timestep Python
loop becomes a single ``nn.scan``/``lax.scan``, so an entire encoder pass
(T steps) or decoder rollout (up to 120 steps) compiles into one fused XLA
while-loop.  The decoder's evolving influence matrix
(G ← l1norm(G + ΔG) each step, `recurrent.py:361-364`) is part of the scan
carry.

Intentionally not reproduced from the reference: clockwork phase masks (dead
code with the shipped configs — ``clockwork=False`` → mask ≡ 1,
`recurrent.py:291-301,344`) and dropout (0 in every config).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .graph_linear import gmix_nm, gmm, gmm_nm, l1_normalize_rows
from .initializers import uniform_stdv

Array = jnp.ndarray
# (hidden [B,N,H], influence [N,N]); the reference's GraphGRUState
GraphGRUState = Tuple[Array, Array]
# (hidden, cell, influence); the reference's GraphLSTMState
GraphLSTMState = Tuple[Array, Array, Array]


class StaticGraphGRUCell(nn.Module):
    """One graph-GRU step; reference `recurrent.py:208-366`.

    gates_x = G·(x·W_ih[type] + b_ih) ; gates_h = G·(h·W_hh[type] + b_hh)
    r = σ(i_r+h_r), z = σ(i_z+h_z), n = tanh(i_n + r·h_n)
    h' = n − n·z + z·h ;  G' = l1norm(G + ΔG)  (when influence is learned)

    Scan-compatible signature: ``(carry, x_t) -> (carry', y_t)``.
    """

    input_size: int
    hidden_size: int
    num_nodes: int
    node_types: Optional[np.ndarray] = None
    learn_influence: bool = False
    learn_additive_graph_influence: bool = False
    use_bias: bool = True
    node_major: bool = False  # activations [N,B,F]; see graph_linear.gmm_nm
    compute_dtype: str = None  # e.g. 'bfloat16'; params/carry stay fp32

    @nn.compact
    def __call__(self, carry: GraphGRUState, x: Array) -> Tuple[GraphGRUState, Array]:
        hx, gx = carry
        type_index, n_types = _type_index(self.node_types, self.num_nodes)
        H = self.hidden_size
        init = uniform_stdv(H)
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None

        # [types, in, 3H]; the reference stores [types, 3H, in] and transposes
        # at use (`recurrent.py:270-277,346-347`) — same linear map
        w_ih = self.param("weight_ih", init, (n_types, self.input_size, 3 * H))
        w_hh = self.param("weight_hh", init, (n_types, H, 3 * H))

        mm = gmm_nm if self.node_major else gmm
        if cdt is not None:
            x, hx_c = x.astype(cdt), hx.astype(cdt)
            w_ih, w_hh = w_ih.astype(cdt), w_hh.astype(cdt)
        else:
            hx_c = hx
        x_results = mm(x, w_ih[type_index])
        h_results = mm(hx_c, w_hh[type_index])
        if self.use_bias:
            b_ih = self.param("bias_ih", init, (n_types, 3 * H))
            b_hh = self.param("bias_hh", init, (n_types, 3 * H))
            if cdt is not None:
                b_ih, b_hh = b_ih.astype(cdt), b_hh.astype(cdt)
            badd = (lambda b: b[:, None, :]) if self.node_major else (lambda b: b)
            x_results = x_results + badd(b_ih[type_index])
            h_results = h_results + badd(b_hh[type_index])

        gx_c = gx.astype(cdt) if cdt is not None else gx
        if self.node_major:
            x_results = gmix_nm(gx_c, x_results)
            h_results = gmix_nm(gx_c, h_results)
        else:
            x_results = jnp.einsum("nm,bmo->bno", gx_c, x_results)
            h_results = jnp.einsum("nm,bmo->bno", gx_c, h_results)

        i_r, i_z, i_n = jnp.split(x_results, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(h_results, 3, axis=-1)

        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        # the carried hidden state stays float32 (bf16 carries would compound
        # 120-step rollout error); only the matmuls run reduced precision
        hy = (n - n * z).astype(hx.dtype) + z.astype(hx.dtype) * hx

        if self.learn_additive_graph_influence:
            G_add = self.param("G_add", nn.initializers.zeros, (self.num_nodes, self.num_nodes))
            gx = gx + G_add
        if self.learn_influence or self.learn_additive_graph_influence:
            gx = l1_normalize_rows(gx)
        return (hy, gx), hy


class StaticGraphLSTMCell(nn.Module):
    """One graph-LSTM step; reference `recurrent.py:13-167`.  Weight banks are
    type-tied at init (`recurrent.py:115-124`)."""

    input_size: int
    hidden_size: int
    num_nodes: int
    node_types: Optional[np.ndarray] = None
    learn_influence: bool = False
    learn_additive_graph_influence: bool = False
    use_bias: bool = True
    node_major: bool = False
    compute_dtype: str = None  # e.g. 'bfloat16'; params/carries stay fp32

    @nn.compact
    def __call__(self, carry: GraphLSTMState, x: Array) -> Tuple[GraphLSTMState, Array]:
        hx, cx, gx = carry
        type_index, n_types = _type_index(self.node_types, self.num_nodes)
        H = self.hidden_size
        base = uniform_stdv(H)
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None

        def tied(key, shape, dtype=jnp.float32):
            w = base(key, shape, dtype)
            return jnp.broadcast_to(w[0:1], w.shape)  # `recurrent.py:123-124`

        w_ih = self.param("weight_ih", tied, (n_types, self.input_size, 4 * H))
        w_hh = self.param("weight_hh", tied, (n_types, H, 4 * H))

        mm = gmm_nm if self.node_major else gmm
        if cdt is not None:
            x, hx_c = x.astype(cdt), hx.astype(cdt)
            w_ih, w_hh = w_ih.astype(cdt), w_hh.astype(cdt)
        else:
            hx_c = hx
        gates = mm(x, w_ih[type_index]) + mm(hx_c, w_hh[type_index])
        if self.use_bias:
            # only bias_hh enters the forward pass (`recurrent.py:149-150`);
            # bias_ih exists upstream but is unused — not replicated
            b_hh = self.param("bias_hh", base, (n_types, 4 * H))
            if cdt is not None:
                b_hh = b_hh.astype(cdt)
            gates = gates + (b_hh[type_index][:, None, :] if self.node_major else b_hh[type_index])
        gx_c = gx.astype(cdt) if cdt is not None else gx
        gates = gmix_nm(gx_c, gates) if self.node_major else jnp.einsum("nm,bmo->bno", gx_c, gates)

        i, f, g, o = jnp.split(gates, 4, axis=-1)
        # carried (h, c) stay float32 — see the GRU cell
        cy = jax.nn.sigmoid(f).astype(cx.dtype) * cx + (
            jax.nn.sigmoid(i) * jnp.tanh(g)
        ).astype(cx.dtype)
        hy = jax.nn.sigmoid(o).astype(cx.dtype) * jnp.tanh(cy)

        if self.learn_additive_graph_influence:
            G_add = self.param("G_add", nn.initializers.zeros, (self.num_nodes, self.num_nodes))
            gx = gx + G_add
        if self.learn_influence or self.learn_additive_graph_influence:
            gx = l1_normalize_rows(gx)
        return (hy, cy, gx), hy


def _type_index(node_types, num_nodes):
    if node_types is None:
        return np.zeros(num_nodes, dtype=np.int32), 1
    nt = np.asarray(node_types, dtype=np.int32)
    return nt, int(nt.max()) + 1


class _GraphRNNBase(nn.Module):
    """Multi-layer graph RNN over a sequence; reference `recurrent.py:369-402`.

    Input ``[B,T,N,F]`` → (output ``[B,T,N,H]``, final states).  Initial state
    per layer: hidden defaults to zeros and the influence matrix to the
    layer's (normalized, learnable) G — mirroring the reference's lazy
    ``None``-state handling (`recurrent.py:321-329`).
    """

    input_size: int
    hidden_size: int
    num_nodes: int
    num_layers: int = 1
    node_types: Optional[np.ndarray] = None
    learn_influence: bool = False
    learn_additive_graph_influence: bool = False
    use_bias: bool = True
    node_major: bool = False  # input [T,N,B,F] (time-major) instead of [B,T,N,F]
    compute_dtype: str = None

    cell_cls = StaticGraphGRUCell

    def _initial_g(self, layer: int) -> Array:
        if self.learn_influence:
            G = self.param(f"G{layer}", lambda key: jnp.eye(self.num_nodes, dtype=jnp.float32))
            return l1_normalize_rows(G)
        return jnp.eye(self.num_nodes, dtype=jnp.float32)

    def _default_state(self, batch: int, layer: int, dtype):
        if self.node_major:
            h0 = jnp.zeros((self.num_nodes, batch, self.hidden_size), dtype=dtype)
        else:
            h0 = jnp.zeros((batch, self.num_nodes, self.hidden_size), dtype=dtype)
        g0 = self._initial_g(layer)
        if self.cell_cls is StaticGraphLSTMCell:
            return (h0, jnp.zeros_like(h0), g0)
        return (h0, g0)

    @nn.compact
    def __call__(self, x: Array, states: Optional[List] = None):
        batch = x.shape[2] if self.node_major else x.shape[0]
        if states is None:
            states = [None] * self.num_layers

        out = x
        final_states = []
        for i in range(self.num_layers):
            state = states[i]
            default = self._default_state(batch, i, x.dtype)
            if state is None:
                state = default
            else:
                # fill None slots (e.g. (h0, None) from an initial-hidden
                # projection) with defaults
                state = tuple(d if s is None else s for s, d in zip(state, default))

            time_axis = 0 if self.node_major else 1
            scan_cell = nn.scan(
                self.cell_cls,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=time_axis,
                out_axes=time_axis,
            )(
                input_size=self.input_size if i == 0 else self.hidden_size,
                hidden_size=self.hidden_size,
                num_nodes=self.num_nodes,
                node_types=self.node_types,
                learn_influence=self.learn_influence,
                learn_additive_graph_influence=self.learn_additive_graph_influence,
                use_bias=self.use_bias,
                node_major=self.node_major,
                compute_dtype=self.compute_dtype,
                name=f"cell{i}",
            )
            state, out = scan_cell(state, out)
            final_states.append(state)
        return out, final_states


class StaticGraphGRU(_GraphRNNBase):
    cell_cls = StaticGraphGRUCell


class StaticGraphLSTM(_GraphRNNBase):
    cell_cls = StaticGraphLSTMCell
