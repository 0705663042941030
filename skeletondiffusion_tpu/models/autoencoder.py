"""Graph-recurrent motion AutoEncoder: pose sequence [B,T,N,3] ⇄ per-joint
latent [B,N,latent].

Mirrors reference `src/core/network/nn/{encoder,decoder,autoencoder}.py`
with TPU-native loops and layout: the encoder runs its graph-GRU over T
observed frames as one ``nn.scan`` in time-major node-major layout [T,N,B,F]
(zero per-step transposes, see ``ops.graph_linear.gmm_nm``); the decoder's
autoregressive-in-hidden-state rollout (constant input [x_{T-1}, z],
evolving hidden + influence matrix, `decoder.py:85-104`) is one ``nn.scan``
whose step applies the output head INSIDE the scan — only the [T,N,B,3]
outputs are materialized, never the [T,N,B,H] hidden states.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph_gru import (
    StaticGraphGRU,
    StaticGraphGRUCell,
    StaticGraphLSTM,
    StaticGraphLSTMCell,
)
from ..ops.graph_linear import StaticGraphLinear, l1_normalize_rows

Array = jnp.ndarray


class Encoder(nn.Module):
    """Graph-GRU (or LSTM) over the input sequence; hidden initialized from
    frame 0 via a graph linear; output = tanh(fc(last hidden)).  Reference
    `src/core/network/nn/encoder.py:10-82`."""

    num_nodes: int
    input_size: int
    hidden_size: int
    output_size: int
    node_types: Optional[np.ndarray] = None
    enc_num_layers: int = 1
    encoder_act: str = "tanh"
    recurrent_arch: str = "StaticGraphGRU"
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: Array, last_index=None) -> Tuple[Array, List]:
        """``last_index`` (traced int, default T-1) selects which step's
        hidden feeds the latent head — because the GRU is causal, reading
        step ``ph-1`` of a full-length scan equals encoding the truncated
        sequence ``x[:, :ph]``.  This lets the curriculum's dynamic horizon
        (`src/core/trainer.py:84-87`) live inside ONE compiled program."""
        rnn_cls = {"StaticGraphGRU": StaticGraphGRU, "StaticGraphLSTM": StaticGraphLSTM}[
            self.recurrent_arch
        ]
        x_nm = jnp.transpose(x, (1, 2, 0, 3))  # [B,T,N,F] → [T,N,B,F]
        rnn = rnn_cls(
            input_size=self.input_size, hidden_size=self.hidden_size,
            num_nodes=self.num_nodes, num_layers=self.enc_num_layers,
            node_types=self.node_types, learn_influence=True, use_bias=True,
            node_major=True, compute_dtype=self.compute_dtype, name="rnn",
        )
        h0 = StaticGraphLinear(
            self.input_size, self.hidden_size, num_nodes=self.num_nodes,
            node_types=self.node_types, learn_influence=True, node_major=True,
            name="initial_hidden1",
        )(x_nm[0])
        if self.recurrent_arch == "StaticGraphLSTM":
            c0 = StaticGraphLinear(
                self.input_size, self.hidden_size, num_nodes=self.num_nodes,
                node_types=self.node_types, learn_influence=True, node_major=True,
                name="initial_hidden_c",
            )(x_nm[0])
            states = [(h0, c0, None)] * self.enc_num_layers
        else:
            states = [(h0, None)] * self.enc_num_layers

        y, state = rnn(x_nm, states)  # [T,N,B,H]
        if last_index is None:
            y_last = y[-1]
        else:
            y_last = jnp.take(y, jnp.asarray(last_index).astype(jnp.int32), axis=0)
        h = StaticGraphLinear(
            self.hidden_size, self.output_size, num_nodes=self.num_nodes,
            node_types=self.node_types, learn_influence=True, node_major=True, name="fc",
        )(y_last)
        if self.encoder_act == "tanh":
            h = jnp.tanh(h)
        return jnp.swapaxes(h, 0, 1), state  # [B,N,latent]


class _RolloutStep(nn.Module):
    """One decoder step: graph-RNN cell + tanh(graph-linear) output head —
    scanned over the prediction horizon with a broadcast (constant) input."""

    cell_cls: type
    input_size: int
    hidden_size: int
    output_size: int
    num_nodes: int
    node_types: Optional[np.ndarray] = None
    compute_dtype: str = None

    @nn.compact
    def __call__(self, carry, x: Array):
        carry, h = self.cell_cls(
            input_size=self.input_size, hidden_size=self.hidden_size,
            num_nodes=self.num_nodes, node_types=self.node_types,
            learn_influence=True, learn_additive_graph_influence=True,
            node_major=True, compute_dtype=self.compute_dtype, name="cell",
        )(carry, x)
        y = StaticGraphLinear(
            self.hidden_size, self.output_size, num_nodes=self.num_nodes,
            node_types=self.node_types, learn_influence=True, node_major=True,
            compute_dtype=self.compute_dtype, name="fc",
        )(h)
        return carry, jnp.tanh(y).astype(jnp.float32)


class Decoder(nn.Module):
    """Rollout decoder; reference `src/core/network/nn/decoder.py:9-104`.

    Hidden init from [x_{T-2}, z]; constant per-step input [x_{T-1}, z]; each
    step emits tanh(fc(h_t)).  The influence matrix evolves through the
    rollout (learn_additive_graph_influence=True, `decoder.py:36-40`).
    """

    num_nodes: int
    feature_size: int          # 3
    input_size: int            # latent size of z
    hidden_size: int
    output_size: int           # 3
    node_types: Optional[np.ndarray] = None
    dec_num_layers: int = 1
    recurrent_arch_decoder: str = "StaticGraphGRU"
    compute_dtype: str = None

    @nn.compact
    def __call__(self, x: Array, z: Array, ph: int = 1) -> Tuple[Array, Array]:
        assert self.dec_num_layers == 1, "shipped configs use a single decoder layer"
        cell_cls = {
            "StaticGraphGRU": StaticGraphGRUCell,
            "StaticGraphLSTM": StaticGraphLSTMCell,
        }[self.recurrent_arch_decoder]
        is_lstm = cell_cls is StaticGraphLSTMCell

        # node-major seeds: [B,N,F] → [N,B,F]
        x_t = jnp.swapaxes(x[:, -1], 0, 1)
        x_t_1 = jnp.swapaxes(x[:, -2], 0, 1)
        z_nm = jnp.swapaxes(z, 0, 1)
        h0_in = jnp.concatenate([x_t_1, z_nm], axis=-1)
        h0 = StaticGraphLinear(
            self.feature_size + self.input_size, self.hidden_size, num_nodes=self.num_nodes,
            node_types=self.node_types, learn_influence=True, node_major=True,
            name="initial_hidden_h",
        )(h0_in)
        G = self.param("G0", lambda key: jnp.eye(self.num_nodes, dtype=jnp.float32))
        g0 = l1_normalize_rows(G)
        if is_lstm:
            c0 = StaticGraphLinear(
                self.feature_size + self.input_size, self.hidden_size, num_nodes=self.num_nodes,
                node_types=self.node_types, learn_influence=True, node_major=True,
                name="initial_hidden_c",
            )(h0_in)
            carry = (h0, c0, g0)
        else:
            carry = (h0, g0)

        rec_input = jnp.concatenate([x_t, z_nm], axis=-1)  # constant every step

        scan_step = nn.scan(
            _RolloutStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=ph,
        )(
            cell_cls=cell_cls,
            input_size=self.feature_size + self.input_size,
            hidden_size=self.hidden_size,
            output_size=self.output_size,
            num_nodes=self.num_nodes,
            node_types=self.node_types,
            compute_dtype=self.compute_dtype,
            name="rollout",
        )
        _, ys = scan_step(carry, rec_input)           # [ph,N,B,3]
        out = jnp.transpose(ys, (2, 0, 1, 3))          # [B,ph,N,3]
        return out, jnp.swapaxes(x_t, 0, 1)


class AutoEncoder(nn.Module):
    """seq→latent→seq; reference `src/core/network/nn/autoencoder.py:8-98`.

    Apply with ``method=``:  ``encode`` (≡ reference forward),
    ``get_past_embedding`` (stop-grad + extra tanh, `autoencoder.py:51-55`),
    ``get_train_embeddings``, ``decode`` and ``autoencode``.
    """

    num_nodes: int
    encoder_hidden_size: int
    decoder_hidden_size: int
    latent_size: int
    node_types: Optional[np.ndarray] = None
    input_size: int = 3
    output_size: int = 3
    z_activation: str = "tanh"
    enc_num_layers: int = 1
    loss_pose_type: str = "l1"
    recurrent_arch_enc: str = "StaticGraphGRU"
    recurrent_arch_decoder: str = "StaticGraphGRU"
    compute_dtype: str = None

    def setup(self):
        self.encoder = Encoder(
            num_nodes=self.num_nodes, input_size=self.input_size,
            hidden_size=self.encoder_hidden_size, output_size=self.latent_size,
            node_types=self.node_types, enc_num_layers=self.enc_num_layers,
            recurrent_arch=self.recurrent_arch_enc, compute_dtype=self.compute_dtype,
        )
        self.decoder = Decoder(
            num_nodes=self.num_nodes, feature_size=self.input_size,
            input_size=self.latent_size, hidden_size=self.decoder_hidden_size,
            output_size=self.output_size, node_types=self.node_types,
            recurrent_arch_decoder=self.recurrent_arch_decoder,
            compute_dtype=self.compute_dtype,
        )

    def _z_act(self, h: Array) -> Array:
        return jnp.tanh(h) if self.z_activation == "tanh" else h

    def __call__(self, x: Array) -> Array:
        return self.encode(x)

    def encode(self, x: Array, last_index=None) -> Array:
        h, _ = self.encoder(x, last_index=last_index)
        return h

    def get_past_embedding(self, past: Array) -> Array:
        """stop-grad encoder + z activation (note the reference applies tanh
        on an already-tanh'd encoder output, `autoencoder.py:51-55` — kept)."""
        return self._z_act(jax.lax.stop_gradient(self.encode(past)))

    def get_train_embeddings(self, y: Array, past: Array, y_last_index=None) -> Tuple[Array, Array]:
        """(z_past detached, z with grad); reference `autoencoder.py:61-64`.
        ``y_last_index`` lets curriculum training encode a dynamic-length
        future inside one compiled program (see ``Encoder.__call__``)."""
        return self.get_past_embedding(past), self.encode(y, last_index=y_last_index)

    def decode(self, x: Array, h: Array, z: Array, ph: int = 1) -> Array:
        """Decode latent ``h`` into ``ph`` future frames seeded by the last
        two observed poses.  Parameter naming follows the reference
        (`autoencoder.py:66-73`): ``h`` is the (sampled/future) latent the
        decoder conditions on; ``z`` is accepted for API parity but unused —
        the reference's decoder ignores it too (`decoder.py:85-104`).
        """
        out, _ = self.decoder(x[:, -2:], h, ph=ph)
        return out

    def autoencode(self, y: Array, past: Array, ph: int = 1, y_last_index=None) -> Tuple[Array, Array, Array]:
        z_past, z = self.get_train_embeddings(y, past, y_last_index=y_last_index)
        out = self.decode(past, z, z_past, ph=ph)
        return out, z_past, z


def autoencoder_loss(y_pred: Array, y: Array, loss_type: str = "l1", reduction: str = "mean") -> Array:
    """L1/MSE summed over xyz, mean over joints and time; reference
    `autoencoder.py:80-98`."""
    if loss_type == "mse":
        out = (y_pred - y) ** 2
    elif loss_type in ("l1", "L1"):
        out = jnp.abs(y_pred - y)
    else:
        raise NotImplementedError(loss_type)
    loss = out.sum(-1).mean(-1).mean(-1)
    if reduction == "mean":
        return loss.mean()
    if reduction == "none":
        return loss
    raise NotImplementedError(reduction)
