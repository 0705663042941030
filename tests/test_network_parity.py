"""Full-network numerical parity: port reference torch weights into the flax
Denoiser/AutoEncoder and compare forward passes on fixed inputs."""
import os

import numpy as np
import pytest

from skeletondiffusion_tpu.models import AutoEncoder, Denoiser, autoencoder_loss
from skeletondiffusion_tpu.skeleton import create_skeleton
from skeletondiffusion_tpu.utils.torch_port import port_autoencoder, port_denoiser

GOLD = os.path.join(os.path.dirname(__file__), "goldens")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLD, "denoiser_fwd.npz")),
    reason="golden fixtures not generated",
)


@pytest.fixture(scope="module")
def skeleton():
    return create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=30, pred_length=120, if_consider_hip=False,
    )


def test_denoiser_forward_matches_reference(skeleton):
    import jax.numpy as jnp

    g = np.load(os.path.join(GOLD, "denoiser_fwd.npz"))
    sd = {k: g[k] for k in g.files if k not in ("x", "t", "cond", "out")}
    N = skeleton.num_nodes
    den = Denoiser(
        dim=96, out_dim=96, channels=N, cond_dim=96, depth=4,
        node_types=skeleton.nodes_type_id, learn_influence=True,
        attn_dim_head=32, attn_heads=8,
    )
    params = {"params": port_denoiser(sd, depth=4)}
    out = den.apply(params, jnp.asarray(g["x"]), jnp.asarray(g["t"]), jnp.asarray(g["cond"]))
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4)


def test_autoencoder_forward_matches_reference(skeleton):
    import jax.numpy as jnp

    g = np.load(os.path.join(GOLD, "autoencoder_fwd.npz"))
    sd = {k: g[k] for k in g.files if k not in ("past", "fut", "out", "z_past", "z", "dec", "loss_none")}
    N = skeleton.num_nodes
    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=96, decoder_hidden_size=96, latent_size=96,
        node_types=skeleton.nodes_type_id,
    )
    params = {"params": port_autoencoder(sd)}
    past, fut = jnp.asarray(g["past"]), jnp.asarray(g["fut"])
    out, z_past, z = ae.apply(params, fut, past, ph=24, method=AutoEncoder.autoencode)
    np.testing.assert_allclose(np.asarray(z), g["z"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_past), g["z_past"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=1e-3)

    dec = ae.apply(params, past, z, z_past, ph=24, method=AutoEncoder.decode)
    np.testing.assert_allclose(np.asarray(dec), g["dec"], atol=1e-3)

    loss = autoencoder_loss(out, fut, loss_type="l1", reduction="none")
    np.testing.assert_allclose(np.asarray(loss), g["loss_none"], atol=1e-3)


def test_rnn_cell_port_drops_unused_lstm_bias_ih():
    """The reference LSTM defines bias_ih but never uses it in the forward
    (`recurrent.py:149-150`); the port must not emit it (the flax cell has
    no such param)."""
    import numpy as np

    from skeletondiffusion_tpu.utils.torch_port import _rnn_cell

    H, T = 8, 3
    sd_lstm = {
        "c.weight_ih": np.zeros((T, 4 * H, 6)), "c.weight_hh": np.zeros((T, 4 * H, H)),
        "c.bias_ih": np.zeros((T, 4 * H)), "c.bias_hh": np.zeros((T, 4 * H)),
    }
    out = _rnn_cell(sd_lstm, "c")
    assert "bias_ih" not in out and "bias_hh" in out

    sd_gru = {
        "c.weight_ih": np.zeros((T, 3 * H, 6)), "c.weight_hh": np.zeros((T, 3 * H, H)),
        "c.bias_ih": np.zeros((T, 3 * H)), "c.bias_hh": np.zeros((T, 3 * H)),
    }
    out = _rnn_cell(sd_gru, "c")
    assert "bias_ih" in out and "bias_hh" in out


def test_dynamic_graph_linear_subgraph_selection():
    """DynamicGraphLinear selects G[t][:,t] when only node ids are given
    (reference `graph_structural.py:46-54`); passing the same sub-matrix
    explicitly must be identical."""
    import jax
    import jax.numpy as jnp

    from skeletondiffusion_tpu.ops.graph_linear import DynamicGraphLinear

    lin = DynamicGraphLinear(in_features=6, out_features=5, max_nodes=10)
    x = jax.random.normal(jax.random.key(0), (2, 4, 6))
    t = jnp.asarray([0, 3, 7, 9])
    params = lin.init(jax.random.key(1), x, t=t)
    params["params"]["G"] = jax.random.normal(jax.random.key(2), (10, 10))

    out_t = lin.apply(params, x, t=t)
    g_sub = params["params"]["G"][t][:, t]
    out_g = lin.apply(params, x, g=g_sub)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_g), atol=1e-6)
    assert out_t.shape == (2, 4, 5)


def test_lstm_architecture_usable():
    """StaticGraphLSTM encoder+decoder init/apply (review finding: the LSTM
    cell lacked the compute_dtype field every caller passes, so the whole
    architecture crashed with TypeError)."""
    import jax
    import jax.numpy as jnp

    from skeletondiffusion_tpu.models import AutoEncoder

    N, H, L, OBS, PH, B = 5, 8, 8, 4, 6, 2
    for cdt in (None, "bfloat16"):
        ae = AutoEncoder(
            num_nodes=N, encoder_hidden_size=H, decoder_hidden_size=H,
            latent_size=L, recurrent_arch_enc="StaticGraphLSTM",
            recurrent_arch_decoder="StaticGraphLSTM", compute_dtype=cdt,
        )
        x = jax.random.normal(jax.random.key(0), (B, OBS, N, 3)) * 0.2
        y = jax.random.normal(jax.random.key(1), (B, PH, N, 3)) * 0.2
        params = ae.init(jax.random.key(2), y, x, ph=PH, method=AutoEncoder.autoencode)
        out, z_past, z = ae.apply(params, y, x, ph=PH, method=AutoEncoder.autoencode)
        assert out.shape == (B, PH, N, 3) and bool(jnp.isfinite(out).all()), cdt
        assert z.shape == (B, N, L) and bool(jnp.isfinite(z).all()), cdt
