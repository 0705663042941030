"""Serving artifact (jax.export StableHLO + msgpack weights): exported
program reproduces the live predictor exactly and reloads without any model
construction code."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeletondiffusion_tpu.diffusion.manager import create_diffusion
from skeletondiffusion_tpu.eval_pipeline import SkeletonDiffusionPredictor
from skeletondiffusion_tpu.models import AutoEncoder
from skeletondiffusion_tpu.serving import ServingModel, export_predictor
from skeletondiffusion_tpu.skeleton import create_skeleton

OBS, PRED, LAT, B, S = 5, 8, 16, 3, 4


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    sk = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.1, obs_length=OBS, pred_length=PRED, if_consider_hip=False,
    )
    N = sk.num_nodes
    ae = AutoEncoder(num_nodes=N, encoder_hidden_size=16, decoder_hidden_size=16,
                     latent_size=LAT, node_types=sk.nodes_type_id)
    ae_params = ae.init(
        jax.random.key(0), jnp.zeros((2, PRED, N, 3)), jnp.zeros((2, OBS, N, 3)),
        ph=PRED, method=AutoEncoder.autoencode,
    )
    diffusion, den = create_diffusion(
        sk, diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency", latent_size=LAT,
        diffusion_conditioning=True, diffusion_timesteps=4,
        diffusion_arch={"depth": 1, "attn_heads": 2, "attn_dim_head": 8,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
    )
    dparams = den.init(
        jax.random.key(1), jnp.zeros((2, N, LAT)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, N, LAT)),
    )
    predictor = SkeletonDiffusionPredictor(
        sk, ae, ae_params, diffusion, dparams, num_samples=S, pred_length=PRED,
    )
    out = str(tmp_path_factory.mktemp("artifact"))
    export_predictor(predictor, out, batch_size=B)
    return sk, predictor, out


def test_export_writes_complete_artifact(artifact):
    _, _, out = artifact
    names = set(os.listdir(out))
    assert {f"predict_b{B}.stablehlo", "params.msgpack", "manifest.json"} <= names
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["batch_sizes"] == [B] and m["num_samples"] == S
    assert m["pred_length"] == PRED and m["platforms"] == [jax.default_backend()]


def test_loaded_artifact_matches_live_predictor(artifact):
    sk, predictor, out = artifact
    model = ServingModel(out)
    assert model.batch_size == B and model.num_samples == S
    obs = jax.random.normal(jax.random.key(7), (B, OBS, sk.num_nodes, 3)) * 0.3
    rng = jax.random.key(11)

    want, _ = predictor(rng, obs)
    got = model(rng, obs)
    assert got.shape == (B, S, PRED, sk.num_nodes, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # a different key gives different samples (rng is threaded, not baked in)
    other = model(jax.random.key(12), obs)
    assert np.abs(np.asarray(other) - np.asarray(got)).max() > 1e-4


def test_spmd_export_matches_single_device(artifact):
    """Data-parallel export: the GSPMD-partitioned artifact over a 4-way
    'data' mesh returns the same predictions as the single-device one."""
    from skeletondiffusion_tpu.parallel import create_mesh

    sk, predictor, _ = artifact
    mesh = create_mesh(n_devices=4)
    out = export_predictor(
        predictor, str(_tmp(artifact)), batch_size=4, mesh=mesh,
    )
    model = ServingModel(out, mesh=mesh)
    obs = jax.random.normal(jax.random.key(8), (4, OBS, sk.num_nodes, 3)) * 0.3
    rng = jax.random.key(13)
    want, _ = predictor(rng, obs)
    got = model(rng, obs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # loading an SPMD artifact without a mesh is rejected
    with pytest.raises(ValueError):
        ServingModel(out)


def test_spmd_with_batch_buckets(artifact):
    """SPMD export composes with batch buckets: a batch-3 request pads into
    the sharded size-4 bucket and matches the live predictor."""
    from skeletondiffusion_tpu.parallel import create_mesh

    sk, predictor, _ = artifact
    mesh = create_mesh(n_devices=4)
    out = _tmp(artifact)
    export_predictor(predictor, out, batch_size=[4, 8], mesh=mesh)
    model = ServingModel(out, mesh=mesh)
    obs3 = jax.random.normal(jax.random.key(30), (3, OBS, sk.num_nodes, 3)) * 0.3
    got = model(jax.random.key(31), obs3)
    padded = jnp.concatenate([obs3, obs3[-1:]], axis=0)
    want, _ = predictor(jax.random.key(31), padded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want)[:3], atol=1e-5)


def _tmp(artifact):
    import tempfile
    return tempfile.mkdtemp(prefix="spmd_artifact_")


def test_wrong_shape_rejected(artifact):
    sk, _, out = artifact
    model = ServingModel(out)
    with pytest.raises(ValueError):  # over the largest bucket
        model(jax.random.key(0), np.zeros((B + 1, OBS, sk.num_nodes, 3), np.float32))
    with pytest.raises(ValueError):  # wrong tail shape
        model(jax.random.key(0), np.zeros((B, OBS + 1, sk.num_nodes, 3), np.float32))
    with pytest.raises(ValueError):  # empty request (pad-to-bucket can't fix B=0)
        model(jax.random.key(0), np.zeros((0, OBS, sk.num_nodes, 3), np.float32))
    with pytest.raises(ValueError):  # mesh on a single-device artifact
        from skeletondiffusion_tpu.parallel import create_mesh
        ServingModel(out, mesh=create_mesh(n_devices=4))


def test_batch_buckets_route_and_pad(artifact):
    """Multi-bucket artifact: a batch-3 request routes to the size-4 bucket;
    the result equals the live predictor on the identically padded batch,
    sliced — and a full-bucket request takes its exact program."""
    sk, predictor, _ = artifact
    out = _tmp(artifact)
    export_predictor(predictor, out, batch_size=[2, 4])
    model = ServingModel(out)
    assert model.batch_sizes == [2, 4] and model.batch_size == 4

    obs3 = jax.random.normal(jax.random.key(20), (3, OBS, sk.num_nodes, 3)) * 0.3
    got = model(jax.random.key(21), obs3)
    assert got.shape == (3, S, PRED, sk.num_nodes, 3)
    padded = jnp.concatenate([obs3, obs3[-1:]], axis=0)
    want, _ = predictor(jax.random.key(21), padded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want)[:3], atol=1e-6)

    obs2 = obs3[:2]
    got2 = model(jax.random.key(22), obs2)
    want2, _ = predictor(jax.random.key(22), obs2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-6)
