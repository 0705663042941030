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
