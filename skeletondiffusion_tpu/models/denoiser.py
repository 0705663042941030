"""Joint-graph Denoiser: the diffusion network over per-joint latents
[B, N, 96(+96 cond)].

Mirrors the reference architecture (`src/core/network/nn/generator.py:8-107`):
graph-linear stem → sinusoidal time MLP → depth×2 pairs of (FiLM'd
ResnetBlock, joint-attention residual) with the last pair's attention
replaced by identity → long skip-concat → final ResnetBlock → graph-linear
head.  Default config: depth=4, heads=8, dim_head=32, learn_influence=True
(`configs/config_train_diffusion/model/skeleton_diffusion.yaml:49-57`).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.attention import PreNormAttentionResidual, ResnetBlock, sinusoidal_pos_emb
from ..ops.graph_linear import StaticGraphLinear
from ..ops.initializers import torch_linear_weight

Array = jnp.ndarray


class Denoiser(nn.Module):
    """Attributes follow the reference constructor (`generator.py:9-27`):

    dim: latent feature size (96); cond_dim: conditioning feature size
    (latent_size when conditioning, else 0); out_dim: output feature size;
    channels/num_nodes: number of skeleton nodes N.
    """

    dim: int
    out_dim: int
    channels: int                      # = num_nodes (reference naming parity)
    cond_dim: int = 0
    depth: int = 1
    node_types: Optional[np.ndarray] = None
    learn_influence: bool = False
    attn_dim_head: int = 32
    attn_heads: int = 4
    use_attention: bool = True
    self_condition: bool = False
    sinusoidal_pos_emb_theta: float = 10000.0
    # internal activations run node-major [N,B,F] — one transpose at entry
    # and exit instead of layout churn at every layer (see ops.graph_linear)
    node_major: bool = True
    # optional reduced-precision compute (e.g. 'bfloat16'): activations and
    # weight casts inside the network; params and outputs stay float32
    compute_dtype: str = None

    def setup(self):
        diffusion_size = self.dim + self.cond_dim
        input_dim = self.dim * (2 if self.self_condition else 1) + self.cond_dim
        self.init_lin = StaticGraphLinear(
            input_dim, diffusion_size, num_nodes=self.channels,
            node_types=self.node_types, learn_influence=self.learn_influence,
            node_major=self.node_major, compute_dtype=self.compute_dtype,
        )

    def cond_embedding(self, x_cond: Array) -> Array:
        """Hoist the conditioning half of the input projection: the sampling
        loop calls the denoiser T times with the SAME ``x_cond``
        (`base.py:243-255`), so its weight product is loop-invariant.
        Returns the node-major partial product to pass as ``u_cond``.
        Requires node_major and no self-conditioning."""
        assert self.node_major and not self.self_condition
        xc = jnp.swapaxes(x_cond, 0, 1)
        return self.init_lin(xc, mode="partial", input_offset=0)

    @nn.compact
    def __call__(
        self,
        x: Array,
        time: Array,
        x_cond: Optional[Array] = None,
        u_cond: Optional[Array] = None,
    ) -> Array:
        num_nodes = self.channels
        diffusion_size = self.dim + self.cond_dim
        input_dim = self.dim * (2 if self.self_condition else 1) + self.cond_dim
        time_dim = diffusion_size * 4
        common = dict(
            num_nodes=num_nodes, node_types=self.node_types,
            learn_influence=self.learn_influence, node_major=self.node_major,
            compute_dtype=self.compute_dtype,
        )

        if u_cond is not None:
            # precomputed conditioning product (see ``cond_embedding``)
            assert x_cond is None and not self.self_condition and self.node_major
            x = jnp.swapaxes(x, 0, 1)
            if self.compute_dtype:
                x = x.astype(jnp.dtype(self.compute_dtype))
            x = self.init_lin(x, input_offset=self.cond_dim, partial_in=u_cond)
        else:
            if self.self_condition:
                # self-conditioning input defaults to zeros (`generator.py:88-90`)
                x = jnp.concatenate([jnp.zeros_like(x), x], axis=-1)
            if x_cond is not None:
                x = jnp.concatenate([x_cond, x], axis=-1)
            if self.node_major:
                x = jnp.swapaxes(x, 0, 1)  # [B,N,F] → [N,B,F]
            if self.compute_dtype:
                x = x.astype(jnp.dtype(self.compute_dtype))
            x = self.init_lin(x)
        r = x

        # time embedding MLP (`generator.py:50-55`); GELU is torch-exact (erf).
        # A scalar ``time`` (sampling: one t for the whole batch) yields a
        # [1, time_dim] embedding that broadcasts in the FiLM layers.
        time = jnp.atleast_1d(jnp.asarray(time))
        t = sinusoidal_pos_emb(time, diffusion_size, self.sinusoidal_pos_emb_theta)
        t = nn.Dense(time_dim, kernel_init=torch_linear_weight(diffusion_size),
                     bias_init=torch_linear_weight(diffusion_size), name="time_mlp0")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, kernel_init=torch_linear_weight(time_dim),
                     bias_init=torch_linear_weight(time_dim), name="time_mlp1")(t)

        # 2·depth (resnet, attention) pairs, last attention = identity
        # (`generator.py:57-77,100-102`)
        n_pairs = 2 * self.depth
        for i in range(n_pairs):
            x = ResnetBlock(
                diffusion_size, diffusion_size, num_nodes=num_nodes, time_emb_dim=time_dim,
                node_types=self.node_types, learn_influence=self.learn_influence,
                node_major=self.node_major, compute_dtype=self.compute_dtype, name=f"res{i}",
            )(x, t)
            if i != n_pairs - 1:
                if self.use_attention:
                    x = PreNormAttentionResidual(
                        diffusion_size, num_nodes=num_nodes, heads=self.attn_heads,
                        dim_head=self.attn_dim_head, node_types=self.node_types,
                        learn_influence=self.learn_influence,
                        node_major=self.node_major, compute_dtype=self.compute_dtype,
                        name=f"attn{i}",
                    )(x)
                else:
                    from ..ops.attention import RMSNorm

                    h = RMSNorm(diffusion_size, name=f"attn{i}_norm")(x)
                    x = x + StaticGraphLinear(
                        diffusion_size, diffusion_size, use_bias=False,
                        name=f"attn{i}_lin", **common,
                    )(h)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(
            diffusion_size * 2, diffusion_size, num_nodes=num_nodes, time_emb_dim=time_dim,
            node_types=self.node_types, learn_influence=self.learn_influence,
            node_major=self.node_major, compute_dtype=self.compute_dtype,
            name="final_res_block",
        )(x, t)
        x = StaticGraphLinear(diffusion_size, self.out_dim, name="final_glin", **common)(x)
        if self.node_major:
            x = jnp.swapaxes(x, 0, 1)  # [N,B,F] → [B,N,F]
        return x.astype(jnp.float32)
