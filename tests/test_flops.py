"""The analytical useful-FLOP model (`utils/flops.py`) cross-checked against
XLA's own HLO cost analysis on the unfused CPU path.

XLA counts everything it actually emits (incl. the time MLP, softmax,
normalizers) while the model deliberately excludes sub-percent terms, so
agreement is asserted within a band, not exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeletondiffusion_tpu.models import AutoEncoder, Denoiser
from skeletondiffusion_tpu.skeleton import create_skeleton
from skeletondiffusion_tpu.utils import flops as F


@pytest.fixture(scope="module")
def skeleton():
    return create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=30, pred_length=120, if_consider_hip=False,
    )


def _xla_flops(jitted, *args):
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def test_denoiser_flops_match_xla(skeleton):
    N, D, B = skeleton.num_nodes, 96, 64
    den = Denoiser(
        dim=D, out_dim=D, channels=N, cond_dim=D, depth=4, node_types=skeleton.nodes_type_id,
        learn_influence=True, attn_dim_head=32, attn_heads=8,
    )
    x = jnp.zeros((B, N, D))
    t = jnp.zeros((B,), jnp.int32)
    c = jnp.zeros((B, N, D))
    params = den.init(jax.random.key(0), x, t, c)
    got = _xla_flops(jax.jit(lambda p, x, t, c: den.apply(p, x, t, c)), params, x, t, c)
    want = B * F.denoiser_forward_flops(N, dim=D, cond=D, depth=4, heads=8, dim_head=32)
    assert 0.75 < got / want < 1.25, (got, want, got / want)


def test_decoder_flops_match_xla(skeleton):
    N, D, B, PH = skeleton.num_nodes, 96, 64, 24
    ae = AutoEncoder(num_nodes=N, encoder_hidden_size=96, decoder_hidden_size=96,
                     latent_size=D, node_types=skeleton.nodes_type_id)
    obs = jnp.zeros((B, 4, N, 3))
    fut = jnp.zeros((B, PH, N, 3))
    params = ae.init(jax.random.key(0), fut, obs, ph=PH, method=AutoEncoder.autoencode)
    z = jnp.zeros((B, N, D))
    got = _xla_flops(
        jax.jit(lambda p, o, z: ae.apply(p, o, z, z, ph=PH, method=AutoEncoder.decode)),
        params, obs, z,
    )
    # XLA cost analysis counts a lax.scan/while body ONCE, not ×trip-count —
    # so compare against the analytical model with pred_len=1 (this still
    # validates the per-step formula, which the real model multiplies by T)
    want = B * F.decoder_flops(N, 1, hidden=96, latent=D)
    assert 0.75 < got / want < 1.25, (got, want, got / want)


def test_encoder_flops_match_xla(skeleton):
    N, D, B, OBS = skeleton.num_nodes, 96, 64, 30
    ae = AutoEncoder(num_nodes=N, encoder_hidden_size=96, decoder_hidden_size=96,
                     latent_size=D, node_types=skeleton.nodes_type_id)
    obs = jnp.zeros((B, OBS, N, 3))
    fut = jnp.zeros((B, 8, N, 3))
    params = ae.init(jax.random.key(0), fut, obs, ph=8, method=AutoEncoder.autoencode)
    got = _xla_flops(
        jax.jit(lambda p, o: ae.apply(p, o, method=AutoEncoder.get_past_embedding)),
        params, obs,
    )
    # scan body counted once by XLA — see test_decoder_flops_match_xla
    want = B * F.encoder_flops(N, 1, hidden=96, latent=D)
    assert 0.75 < got / want < 1.25, (got, want, got / want)


def test_denoiser_backward_is_3x_forward(skeleton):
    """The train model books fwd+bwd as 3× forward (backward of a matmul is
    two matmuls); XLA's cost analysis on value_and_grad should agree."""
    N, D, B = skeleton.num_nodes, 96, 64
    den = Denoiser(
        dim=D, out_dim=D, channels=N, cond_dim=D, depth=4, node_types=skeleton.nodes_type_id,
        learn_influence=True, attn_dim_head=32, attn_heads=8,
    )
    x = jnp.zeros((B, N, D))
    t = jnp.zeros((B,), jnp.int32)
    c = jnp.zeros((B, N, D))
    params = den.init(jax.random.key(0), x, t, c)
    fwd = _xla_flops(jax.jit(lambda p: den.apply(p, x, t, c).sum()), params)
    both = _xla_flops(jax.jit(jax.value_and_grad(lambda p: den.apply(p, x, t, c).sum())), params)
    assert 2.4 < both / fwd < 3.6, (fwd, both, both / fwd)


def test_train_step_flops_composition():
    d2 = F.train_step_flops_stage2(21, 64, 50)
    assert d2["total"] == pytest.approx(
        d2["embed"] + d2["denoiser"] + d2["mixes"] + d2["decode"] + d2["similarity"]
    )
    # at k=50 the forward-only argmin decode (50×120 GRU steps per item)
    # dominates the step's useful FLOPs, then the denoiser fwd+bwd
    assert d2["decode"] > d2["denoiser"] > d2["embed"]
    d1 = F.train_step_flops_stage1(21, 64)
    assert d1["total"] == pytest.approx(3.0 * d1["forward"])
    assert d2["total"] > d1["total"]


def test_prediction_flops_composition(skeleton):
    N = skeleton.num_nodes
    d = F.prediction_flops(N)
    assert d["total"] == pytest.approx(
        d["embed"] + d["sample"] + d["decode"] + d["metric"]
    )
    # flagship magnitude sanity: dominated by sampling (50×10 denoiser
    # forwards), total a few GFLOP per prediction
    assert d["sample"] > d["decode"] > d["embed"]
    assert 1e9 < d["total"] < 1e11
