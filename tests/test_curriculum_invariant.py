"""Curriculum-horizon invariant: the encoder is causal, so reading the scan
hidden at step k-1 (``last_index=k-1``, how the curriculum keeps a dynamic
horizon inside ONE compiled program — `models/autoencoder.py::Encoder`) must
equal encoding the truncated sequence ``x[:, :k]`` outright (the reference
re-slices and re-encodes per epoch, `src/core/trainer.py:84-87`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeletondiffusion_tpu.models import AutoEncoder
from skeletondiffusion_tpu.skeleton import create_skeleton


@pytest.mark.parametrize("arch", ["StaticGraphGRU", "StaticGraphLSTM"])
def test_last_index_equals_truncated_encode(arch):
    sk = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.1, obs_length=5, pred_length=10, if_consider_hip=False,
    )
    N = sk.num_nodes
    ae = AutoEncoder(num_nodes=N, encoder_hidden_size=16, decoder_hidden_size=16,
                     latent_size=12, node_types=sk.nodes_type_id,
                     recurrent_arch_enc=arch)
    x = jax.random.normal(jax.random.key(0), (3, 10, N, 3)) * 0.4
    params = ae.init(jax.random.key(1), x, x[:, :5], ph=10,
                     method=AutoEncoder.autoencode)
    for k in (1, 4, 10):
        full = ae.apply(params, x, last_index=k - 1, method=AutoEncoder.encode)
        trunc = ae.apply(params, x[:, :k], method=AutoEncoder.encode)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(trunc), atol=1e-6,
            err_msg=f"causality violated at horizon {k}",
        )


@pytest.mark.parametrize("arch", ["StaticGraphGRU", "StaticGraphLSTM"])
def test_decode_horizon_prefix_property(arch):
    """The rollout decoder is causal over the horizon: a longer unroll's
    first j frames equal the j-frame unroll exactly — the property the
    extended_pred_length long-term mode relies on (reference
    `motion_dataset.py:64-67` just asks the decoder for more steps)."""
    sk = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.1, obs_length=5, pred_length=10, if_consider_hip=False,
    )
    N = sk.num_nodes
    ae = AutoEncoder(num_nodes=N, encoder_hidden_size=16, decoder_hidden_size=16,
                     latent_size=12, node_types=sk.nodes_type_id,
                     recurrent_arch_decoder=arch)
    x = jax.random.normal(jax.random.key(0), (3, 10, N, 3)) * 0.4
    obs = x[:, :5]
    params = ae.init(jax.random.key(1), x, obs, ph=10, method=AutoEncoder.autoencode)
    z = jax.random.normal(jax.random.key(2), (3, N, 12)) * 0.5
    zp = ae.apply(params, obs, method=AutoEncoder.get_past_embedding)
    long = ae.apply(params, obs, z, zp, ph=10, method=AutoEncoder.decode)
    for j in (1, 4, 10):
        short = ae.apply(params, obs, z, zp, ph=j, method=AutoEncoder.decode)
        np.testing.assert_allclose(
            np.asarray(long[:, :j]), np.asarray(short), atol=1e-6,
            err_msg=f"prefix property violated at horizon {j}",
        )
