"""Direct tests for the formerly indirectly-tested rows: the interpolating
sampler (reference `base.py:335-338`, `nonisotropic.py:218-227`), the
streaming MPJPE/FDE time tables (`ignite_mpjpe.py`, `ignite_fde.py`), and
the result storer (`src/utils/store.py`)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


# ---------------------------------------------------------------- sampler
@pytest.fixture(scope="module")
def small_engine():
    from skeletondiffusion_tpu.diffusion.manager import create_diffusion
    from skeletondiffusion_tpu.skeleton import create_skeleton

    sk = create_skeleton(
        dataset_name="h36m", motion_repr_type="SkeletonRescalePose", num_joints=17,
        pose_box_size=1.5, obs_length=5, pred_length=8, if_consider_hip=False,
    )
    L = 12
    diffusion, den = create_diffusion(
        sk, diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency", latent_size=L,
        diffusion_conditioning=True, diffusion_timesteps=4,
        diffusion_arch={"depth": 1, "attn_heads": 2, "attn_dim_head": 4,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
    )
    params = den.init(
        jax.random.key(0), jnp.zeros((2, sk.num_nodes, L)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, sk.num_nodes, L)),
    )
    return sk, diffusion, params, L


def test_interpolating_full_weight_on_injected_noise(small_engine):
    """interpolate_fn ≡ take-the-injected-trajectory must reproduce
    p_sample_loop(step_noise=...) exactly — this pins the [:, T-1-t]
    indexing parity with the reference (`base.py:331-336`)."""
    sk, diffusion, params, L = small_engine
    B, N, T = 3, sk.num_nodes, diffusion.num_timesteps
    shape = (B, N, L)
    x_cond = jax.random.normal(jax.random.key(1), shape) * 0.3
    start = jax.random.normal(jax.random.key(2), shape)
    traj = jax.random.normal(jax.random.key(3), (B, T - 1, N, L))

    want, _ = diffusion.p_sample_loop(
        params, jax.random.key(4), shape, x_cond=x_cond,
        start_noise=start, step_noise=traj,
    )
    got, returned_start = diffusion.p_sample_loop_interpolating(
        params, jax.random.key(4), shape, noise2interpolate=traj,
        interpolate_fn=lambda own, injected: injected,
        x_cond=x_cond, start_noise=start,
    )
    np.testing.assert_array_equal(np.asarray(returned_start), np.asarray(start))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_interpolating_full_weight_on_own_noise(small_engine):
    """interpolate_fn ≡ take-own-noise must reproduce the plain ancestral
    sampler under the same rng (same split + fold_in schedule)."""
    sk, diffusion, params, L = small_engine
    B, N, T = 3, sk.num_nodes, diffusion.num_timesteps
    shape = (B, N, L)
    x_cond = jax.random.normal(jax.random.key(1), shape) * 0.3
    traj = jnp.zeros((B, T - 1, N, L))

    want, _ = diffusion.p_sample_loop(params, jax.random.key(5), shape, x_cond=x_cond)
    got, _ = diffusion.p_sample_loop_interpolating(
        params, jax.random.key(5), shape, noise2interpolate=traj,
        interpolate_fn=lambda own, injected: own, x_cond=x_cond,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_interpolating_midpoint_lies_between(small_engine):
    """A 0.5 mix differs from both endpoints but stays finite/shaped."""
    sk, diffusion, params, L = small_engine
    B, N, T = 2, sk.num_nodes, diffusion.num_timesteps
    shape = (B, N, L)
    x_cond = jax.random.normal(jax.random.key(1), shape) * 0.3
    traj = jax.random.normal(jax.random.key(6), (B, T - 1, N, L))

    outs = {}
    for name, fn in [("own", lambda a, b: a), ("inj", lambda a, b: b),
                     ("mid", lambda a, b: 0.5 * a + 0.5 * b)]:
        outs[name], _ = diffusion.p_sample_loop_interpolating(
            params, jax.random.key(7), shape, noise2interpolate=traj,
            interpolate_fn=fn, x_cond=x_cond,
        )
    mid = np.asarray(outs["mid"])
    assert np.isfinite(mid).all() and mid.shape == shape
    assert np.abs(mid - np.asarray(outs["own"])).max() > 1e-6
    assert np.abs(mid - np.asarray(outs["inj"])).max() > 1e-6


# ----------------------------------------------------------------- tables
def test_mpjpe_table_streaming_equals_direct():
    from skeletondiffusion_tpu.metrics.tables import (
        MeanPerJointPositionErrorTable, format_metric_time_table)
    rng = np.random.default_rng(0)
    batches = [(rng.normal(size=(b, 75, 5, 3)), rng.normal(size=(b, 75, 5, 3)))
               for b in (4, 3, 5)]
    meter = MeanPerJointPositionErrorTable(keep_time_dim=True, keep_joint_dim=False)
    for p, y in batches:
        meter.update(p, y)
    got = meter.compute()

    # reference semantics: concat everything, per-frame joint-mean of the
    # L2 error, then sample every `interval` frames (`ignite_mpjpe.py:32-38`,
    # `src/metrics/utils.py:5-10`)
    p = np.concatenate([b[0] for b in batches]); y = np.concatenate([b[1] for b in batches])
    per_frame = np.linalg.norm(y - p, axis=-1).mean(axis=(0, 2))  # [T]
    want = format_metric_time_table(per_frame)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # 75 frames @ interval 30 → frames {0, 30, 60}
    assert got.shape == (3,)
    np.testing.assert_allclose(got, per_frame[[0, 30, 60]], rtol=1e-12)


def test_mpjpe_table_keep_joint_and_scalar_modes():
    from skeletondiffusion_tpu.metrics.tables import MeanPerJointPositionErrorTable
    rng = np.random.default_rng(1)
    p, y = rng.normal(size=(6, 40, 4, 3)), rng.normal(size=(6, 40, 4, 3))
    err = np.linalg.norm(y - p, axis=-1)  # [B,T,J]

    mj = MeanPerJointPositionErrorTable(keep_time_dim=True, keep_joint_dim=True)
    mj.update(p, y)
    np.testing.assert_allclose(mj.compute(), err.mean(axis=0)[[0, 30]], rtol=1e-12)

    ms = MeanPerJointPositionErrorTable(keep_time_dim=False, keep_joint_dim=False)
    ms.update(p, y)
    np.testing.assert_allclose(ms.compute(), err.mean(), rtol=1e-12)


def test_fde_meter_streaming_equals_direct():
    from skeletondiffusion_tpu.metrics.tables import FinalDisplacementErrorMeter
    rng = np.random.default_rng(2)
    batches = [(rng.normal(size=(b, 20, 7, 3)), rng.normal(size=(b, 20, 7, 3)))
               for b in (2, 5)]
    meter = FinalDisplacementErrorMeter()
    for p, y in batches:
        meter.update(p, y)
    p = np.concatenate([b[0] for b in batches]); y = np.concatenate([b[1] for b in batches])
    want = np.linalg.norm(y[:, -1] - p[:, -1], axis=-1).mean()
    assert abs(meter.compute() - want) < 1e-12


# ---------------------------------------------------------------- ranking
def test_ranking_greedy_maxmin_order_hand_computed():
    """Greedy max–min semantics (reference `src/metrics/ranking.py:17-63`):
    seed = closest-to-GT, then repeatedly the sample maximizing its min
    distance to the chosen set.  Samples on a line at 0.1, 10, 5, 9 with GT
    at 0 → closest s0, then s1 (9.9 away), then s2 (min 4.9 beats s3's 1)."""
    from skeletondiffusion_tpu.metrics.ranking import get_closest_and_nfurthest_maxapd
    positions = [0.1, 10.0, 5.0, 9.0]
    pred = np.zeros((4, 2, 3, 3))
    for i, p in enumerate(positions):
        pred[i, 0, 0, 0] = p
    target = np.zeros((2, 3, 3))
    closest, diverse, idx = get_closest_and_nfurthest_maxapd(pred, target, nsamples=3)
    np.testing.assert_array_equal(closest, pred[0])
    np.testing.assert_array_equal(idx, [1, 2, 3])
    np.testing.assert_array_equal(diverse, pred[[1, 2, 3]])


# ------------------------------------------------------------------ store
def test_result_storer_roundtrip(tmp_path):
    from skeletondiffusion_tpu.utils.store import ResultStorer
    rng = np.random.default_rng(3)
    out = str(tmp_path / "preds")
    st = ResultStorer(out, store_gt=True)
    pred = rng.normal(size=(4, 50, 15, 21, 3)).astype(np.float32)
    obs = rng.normal(size=(4, 6, 21, 3)).astype(np.float32)
    tgt = rng.normal(size=(4, 15, 21, 3)).astype(np.float32)
    st.append(pred, obs=obs, target=tgt, metadata={"batch": 0})
    st.append(pred[:2], obs=obs[:2])
    st.finalize({"dataset": "amass", "num_samples": 50})

    import os, yaml
    shard0 = np.load(os.path.join(out, "shard_00000.npz"))
    np.testing.assert_array_equal(shard0["pred"], pred)
    np.testing.assert_array_equal(shard0["obs"], obs)
    np.testing.assert_array_equal(shard0["target"], tgt)
    with open(os.path.join(out, "shard_00000.yaml")) as f:
        assert yaml.safe_load(f) == {"batch": 0}
    shard1 = np.load(os.path.join(out, "shard_00001.npz"))
    assert "target" not in shard1.files and shard1["pred"].shape[0] == 2
    with open(os.path.join(out, "config.yaml")) as f:
        assert yaml.safe_load(f)["num_samples"] == 50

    # ragged key presence (target only in shard 0) must be REJECTED — a
    # silent concat would misalign target rows against pred rows
    import pytest
    with pytest.raises(ValueError, match="target"):
        ResultStorer.load(out)

    # aligned dump round-trips
    out2 = str(tmp_path / "preds2")
    st2 = ResultStorer(out2, store_gt=True)
    st2.append(pred, obs=obs, target=tgt)
    st2.append(pred[:2], obs=obs[:2], target=tgt[:2])
    st2.finalize({"dataset": "amass", "num_samples": 50})
    arrays, cfg = ResultStorer.load(out2)
    np.testing.assert_array_equal(arrays["pred"], np.concatenate([pred, pred[:2]]))
    np.testing.assert_array_equal(arrays["obs"], np.concatenate([obs, obs[:2]]))
    np.testing.assert_array_equal(arrays["target"], np.concatenate([tgt, tgt[:2]]))
    assert cfg == {"dataset": "amass", "num_samples": 50}


def test_result_storer_rerun_removes_stale_shards(tmp_path):
    """Re-initializing a storer over an existing out_dir must remove the
    previous run's shards — load() concatenates every shard_* file, so a
    shorter re-run would otherwise silently mix two runs' predictions."""
    import numpy as np

    from skeletondiffusion_tpu.utils.store import ResultStorer

    out = str(tmp_path / "preds")
    st = ResultStorer(out)
    for _ in range(3):
        st.append(np.zeros((2, 1, 4, 3, 3), np.float32))
    st.finalize({"run": 1})
    st2 = ResultStorer(out)
    st2.append(np.ones((2, 1, 4, 3, 3), np.float32))
    st2.finalize({"run": 2})
    arrays, config = ResultStorer.load(out)
    assert arrays["pred"].shape[0] == 2 and (arrays["pred"] == 1).all()
    assert config["run"] == 2


def test_interpolation_handles_braces_inside_quoted_eval():
    """A '}' inside a quoted ${eval:"..."} body (dict literal, format spec)
    is literal, not an interpolation close."""
    from skeletondiffusion_tpu.utils.config import _interpolate_str

    # the string-level helper stringifies; the span must cover the full body
    assert _interpolate_str("${eval:\"{'x': 2}['x']\"}", {}) == "2"
    # nested interpolation inside the quoted body still resolves
    assert _interpolate_str(
        "${eval:\"'${name}.csv' if True else {'k': 1}\"}", {"name": "seg"}
    ) == "seg.csv"


def test_checkpoint_path_resolution_walks_up_to_config(tmp_path):
    """load_model_config_exp resolves the experiment folder from every
    checkpoint-path form this codebase produces: the experiment dir, its
    checkpoints/ dir, and an Orbax checkpoint DIRECTORY inside it (isdir
    alone cannot distinguish these — Orbax checkpoints are directories)."""
    import yaml

    from skeletondiffusion_tpu.inference import load_model_config_exp

    exp = tmp_path / "exp"
    (exp / "checkpoints" / "ckpt_5").mkdir(parents=True)
    with open(exp / "config.yaml", "w") as f:
        yaml.safe_dump({"latent_size": 96}, f)
    for p in (exp, exp / "checkpoints", exp / "checkpoints" / "ckpt_5"):
        cfg, folder = load_model_config_exp(str(p))
        assert folder == str(exp) and cfg["latent_size"] == 96, p
    import pytest

    with pytest.raises(FileNotFoundError):
        load_model_config_exp(str(tmp_path / "nowhere"))


def test_checkpoint_resave_same_step_replaces_index_entry(tmp_path):
    """Re-saving the same step (crash -> resume re-running an epoch) must
    REPLACE the stale index entry, not duplicate it — a duplicate name later
    makes pruning delete the shared directory while the twin entry survives."""
    import jax.numpy as jnp

    from skeletondiffusion_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "ck"), n_saved=2)
    state = {"w": jnp.ones((3,))}
    ckpt.save(state, step=50, score=0.9)
    ckpt.save(state, step=50, score=0.5)  # resume re-ran the epoch
    names = [e["name"] for e in ckpt._index if e["name"].startswith("ckpt")]
    assert names == ["ckpt_50"], names
    assert ckpt._index[-1]["score"] == 0.5
    assert ckpt.best_path() is not None
