"""Milestone C: the full eval pipeline runs on a synthetic AMASS-format
dataset with a randomly initialized model and produces the metric table."""
import os

import jax
import numpy as np
import pytest

from skeletondiffusion_tpu.data import AMASSDataset, compute_multimodal_gt_for_dataset
from skeletondiffusion_tpu.diffusion.manager import create_diffusion
from skeletondiffusion_tpu.eval_pipeline import (
    SkeletonDiffusionPredictor,
    ZeroVelocityPredictor,
    compute_metrics,
)
from skeletondiffusion_tpu.models import AutoEncoder
from skeletondiffusion_tpu.skeleton import create_skeleton

OBS, PRED, J, LAT = 5, 8, 22, 16


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("amass_eval"))
    rng = np.random.default_rng(0)
    positions = {"DFaust": {}}
    for fi in range(2):
        positions["DFaust"][fi] = rng.standard_normal((60, J, 3)).astype(np.float32) * 0.3
    np.savez(os.path.join(root, "data_3d_amass.npz"), positions_3d=positions)
    import pandas as pd

    rows = [
        {"dataset": "DFaust", "file": f"f{fi}", "file_idx": fi, "pred_init": init,
         "pred_end": init + PRED - 1}
        for fi in range(2)
        for init in range(OBS, 60 - PRED, 9)
    ]
    pd.DataFrame(rows).to_csv(os.path.join(root, "segments_test.csv"), index=False)
    lt_rows = [
        {"dataset": "DFaust", "file": f"f{fi}", "file_idx": fi, "pred_init": init,
         "pred_end": init + 2 * PRED - 1}
        for fi in range(2)
        for init in range(OBS, 60 - 2 * PRED, 9)
    ]
    pd.DataFrame(lt_rows).to_csv(os.path.join(root, "segments_test_long_term.csv"), index=False)

    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=J,
        pose_box_size=1.5, obs_length=OBS, pred_length=PRED, if_consider_hip=False,
    )
    ds_tmp = AMASSDataset(
        datasets=["DFaust"], split="test", precomputed_folder=root, skeleton=skeleton,
        obs_length=OBS, pred_length=PRED,
        segments_path=os.path.join(root, "segments_test.csv"),
        if_consider_hip=False, silent=True,
    )
    compute_multimodal_gt_for_dataset(
        ds_tmp, skeleton, multimodal_threshold=3.0, dest_path=os.path.join(root, "mmgt_test.txt")
    )
    import pandas as pd2  # noqa

    # APDE ground-truth file in reference format
    apd_rows = [{"id": i, "gt_APD": 1.0 + 0.1 * i} for i in range(len(ds_tmp))]
    pd.DataFrame(apd_rows).to_csv(os.path.join(root, "mmapd_GT.csv"), index=False)

    dataset = AMASSDataset(
        datasets=["DFaust"], split="test", precomputed_folder=root, skeleton=skeleton,
        obs_length=OBS, pred_length=PRED,
        segments_path=os.path.join(root, "segments_test.csv"),
        if_consider_hip=False, if_load_mmgt=True, silent=True, if_compute_cmd=True,
    )
    return root, skeleton, dataset


def _models(skeleton):
    N = skeleton.num_nodes
    ae = AutoEncoder(num_nodes=N, encoder_hidden_size=16, decoder_hidden_size=16,
                     latent_size=LAT, node_types=skeleton.nodes_type_id)
    import jax.numpy as jnp

    x = jnp.zeros((2, OBS, N, 3))
    y = jnp.zeros((2, PRED, N, 3))
    ae_params = ae.init(jax.random.key(0), y, x, ph=PRED, method=AutoEncoder.autoencode)
    diffusion, den = create_diffusion(
        skeleton, diffusion_type="NonisotropicGaussianDiffusion",
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
    return ae, ae_params, diffusion, dparams


def test_eval_probabilistic_runs(env):
    root, skeleton, dataset = env
    ae, ae_params, diffusion, dparams = _models(skeleton)
    predictor = SkeletonDiffusionPredictor(
        skeleton, ae, ae_params, diffusion, dparams, num_samples=4, pred_length=PRED,
    )
    results = compute_metrics(
        predictor, dataset, skeleton, batch_size=8, num_samples=4,
        stats_mode="probabilistic", if_compute_cmd=True, if_compute_apde=True,
        mmapd_gt_path=os.path.join(root, "mmapd_GT.csv"),
    )
    for key in ("ADE", "FDE", "MAE", "MMADE", "MMFDE", "APD",
                "StretchMean", "JitterMean", "StretchRMSE", "JitterRMSE", "CMD", "APDE"):
        assert key in results and np.isfinite(results[key]), (key, results)
    # random-model sanity: ADE of an untrained model larger than zero-velocity is not
    # guaranteed, but all metrics must be strictly positive
    assert results["ADE"] > 0 and results["APD"] >= 0


def test_pipelined_and_sync_drain_identical(env, monkeypatch):
    """The one-deep host-sync pipeline (SKELDIFF_EVAL_PIPELINE) is a pure
    scheduling change: both drain orders must produce the identical metric
    table (same per-batch RNG keys, same accumulator contents)."""
    root, skeleton, dataset = env
    ae, ae_params, diffusion, dparams = _models(skeleton)
    predictor = SkeletonDiffusionPredictor(
        skeleton, ae, ae_params, diffusion, dparams, num_samples=4, pred_length=PRED,
    )
    out = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("SKELDIFF_EVAL_PIPELINE", flag)
        out[flag] = compute_metrics(
            predictor, dataset, skeleton, batch_size=8, num_samples=4,
            stats_mode="probabilistic", if_compute_cmd=True, if_compute_apde=True,
            mmapd_gt_path=os.path.join(root, "mmapd_GT.csv"),
        )
    assert out["1"].keys() == out["0"].keys()
    for k in out["1"]:
        np.testing.assert_array_equal(out["1"][k], out["0"][k], err_msg=k)


def test_eval_is_deterministic_across_runs(env):
    """Same seed → bit-identical metric table on repeat runs (guards the
    prefetch thread / pipelined drain / pad-RNG paths against
    nondeterminism creep)."""
    root, skeleton, dataset = env
    ae, ae_params, diffusion, dparams = _models(skeleton)
    predictor = SkeletonDiffusionPredictor(
        skeleton, ae, ae_params, diffusion, dparams, num_samples=4, pred_length=PRED,
    )
    runs = [
        compute_metrics(
            predictor, dataset, skeleton, batch_size=8, num_samples=4,
            stats_mode="probabilistic", seed=3, if_compute_cmd=True,
            if_compute_apde=True, mmapd_gt_path=os.path.join(root, "mmapd_GT.csv"),
        )
        for _ in range(2)
    ]
    assert runs[0].keys() == runs[1].keys()
    for k in runs[0]:
        np.testing.assert_array_equal(runs[0][k], runs[1][k], err_msg=k)


def test_fid_in_eval_loop(env):
    import jax.numpy as jnp

    from skeletondiffusion_tpu.metrics.fid import ClassifierForFID

    root, skeleton, dataset = env
    # 21-node pose → 63 features
    clf = ClassifierForFID(input_size=63)
    params = clf.init(jax.random.key(0), jnp.zeros((2, 63, PRED)), jnp.zeros((2, 2, 128)))
    predictor = ZeroVelocityPredictor(skeleton, num_samples=2, pred_length=PRED)
    results = compute_metrics(
        predictor, dataset, skeleton, batch_size=8, num_samples=2,
        stats_mode="deterministic", fid_classifier_params=params,
    )
    assert "FID" in results and np.isfinite(results["FID"])


def test_zero_velocity_baseline(env):
    root, skeleton, dataset = env
    predictor = ZeroVelocityPredictor(skeleton, num_samples=4, pred_length=PRED)
    results = compute_metrics(
        predictor, dataset, skeleton, batch_size=8, num_samples=4,
        stats_mode="deterministic",
    )
    assert results["APD"] == 0.0  # identical samples → zero diversity
    assert results["ADE"] > 0


def test_noisy_obs_eval(env):
    """Eval-time obs-noise robustness feature (reference
    `motion_dataset.py:11-19,187-188`): noisy metrics must differ from clean,
    and the noise must be seed-driven (different seeds → different numbers)."""
    root, skeleton, dataset = env
    predictor = ZeroVelocityPredictor(skeleton, num_samples=2, pred_length=PRED)
    kw = dict(batch_size=8, num_samples=2, stats_mode="deterministic")
    clean = compute_metrics(predictor, dataset, skeleton, seed=0, **kw)
    noisy = compute_metrics(predictor, dataset, skeleton, seed=0,
                            if_noisy_obs=True, noise_level=0.5, noise_std=0.05, **kw)
    noisy2 = compute_metrics(predictor, dataset, skeleton, seed=1,
                             if_noisy_obs=True, noise_level=0.5, noise_std=0.05, **kw)
    # zero-velocity repeats the (noisy) last obs frame → ADE shifts
    assert abs(noisy["ADE"] - clean["ADE"]) > 1e-9, (noisy["ADE"], clean["ADE"])
    assert abs(noisy2["ADE"] - noisy["ADE"]) > 1e-12, noisy["ADE"]
    # determinism: same seed → identical result
    noisy_again = compute_metrics(predictor, dataset, skeleton, seed=0,
                                  if_noisy_obs=True, noise_level=0.5, noise_std=0.05, **kw)
    assert noisy_again["ADE"] == noisy["ADE"]


def test_noise_varies_across_batches(env):
    """Each batch must get a fresh preprocess key (VERDICT r1 weak #6: a
    constant key would give every batch identical noise)."""
    root, skeleton, dataset = env
    from skeletondiffusion_tpu.data.batch import preprocess_batch

    import jax.numpy as jnp

    obs = jnp.zeros((4, OBS, J, 3), jnp.float32)
    pred = jnp.zeros((4, PRED, J, 3), jnp.float32)
    o1, _, _ = preprocess_batch(skeleton, jax.random.key(1), obs, pred, train=False,
                                if_noisy_obs=True, noise_level=1.0, noise_std=0.05)
    o2, _, _ = preprocess_batch(skeleton, jax.random.key(2), obs, pred, train=False,
                                if_noisy_obs=True, noise_level=1.0, noise_std=0.05)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_padded_final_batch_exact_and_single_compile(env):
    """len(dataset)=12, batch_size=8 → final batch of 4 is padded to 8 and
    masked: metrics must equal the single-full-batch run exactly and the
    predict program must compile exactly once (VERDICT r1 weak #4)."""
    root, skeleton, dataset = env
    assert len(dataset) % 8 != 0, len(dataset)
    zv = ZeroVelocityPredictor(skeleton, num_samples=2, pred_length=PRED)
    kw = dict(num_samples=2, stats_mode="probabilistic", if_compute_cmd=True,
              if_compute_apde=True, mmapd_gt_path=os.path.join(root, "mmapd_GT.csv"))
    padded = compute_metrics(zv, dataset, skeleton, batch_size=8, **kw)
    onebatch = compute_metrics(zv, dataset, skeleton, batch_size=len(dataset), **kw)
    for k in padded:
        np.testing.assert_allclose(padded[k], onebatch[k], rtol=1e-5, err_msg=k)

    ae, ae_params, diffusion, dparams = _models(skeleton)
    predictor = SkeletonDiffusionPredictor(
        skeleton, ae, ae_params, diffusion, dparams, num_samples=2, pred_length=PRED,
    )
    compute_metrics(predictor, dataset, skeleton, batch_size=8, num_samples=2,
                    stats_mode="deterministic")
    assert predictor._jit_predict._cache_size() == 1, predictor._jit_predict._cache_size()


def test_long_term_eval_runs(env):
    root, skeleton, dataset_short = env
    # extended target: factor 2 → dataset with extended_pred_length
    skeleton2 = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=J,
        pose_box_size=1.5, obs_length=OBS, pred_length=PRED * 2, if_consider_hip=False,
    )
    dataset = AMASSDataset(
        datasets=["DFaust"], split="test", precomputed_folder=root, skeleton=skeleton2,
        obs_length=OBS, pred_length=PRED, if_long_term_test=True, long_term_factor=2,
        segments_path=os.path.join(root, "segments_test_long_term.csv"),
        if_consider_hip=False, silent=True,
    )
    ae, ae_params, diffusion, dparams = _models(skeleton2)
    predictor = SkeletonDiffusionPredictor(
        skeleton2, ae, ae_params, diffusion, dparams, num_samples=4, pred_length=PRED,
    )
    results = compute_metrics(
        predictor, dataset, skeleton2, batch_size=8, num_samples=4,
        stats_mode="deterministic", if_long_term_test=True, long_term_factor=2.0,
        pred_length=PRED,
    )
    assert np.isfinite(results["ADE"])


def test_eval_probabilistic_orig_runs(env):
    """The reference's third stats_mode (`config_metrics.py:38-41`: the
    5-metric APD/ADE/FDE/MMADE/MMFDE set) runs through compute_metrics and
    agrees with the full probabilistic mode on the shared metrics under the
    same seed."""
    root, skeleton, dataset = env
    ae, ae_params, diffusion, dparams = _models(skeleton)
    predictor = SkeletonDiffusionPredictor(
        skeleton, ae, ae_params, diffusion, dparams, num_samples=4, pred_length=PRED,
    )
    kw = dict(batch_size=8, num_samples=4, seed=11)
    orig = compute_metrics(predictor, dataset, skeleton,
                           stats_mode="probabilistic_orig", **kw)
    assert set(orig) == {"APD", "ADE", "FDE", "MMADE", "MMFDE"}, orig
    full = compute_metrics(predictor, dataset, skeleton,
                           stats_mode="probabilistic", **kw)
    for key in orig:
        np.testing.assert_allclose(orig[key], full[key], rtol=1e-5, err_msg=key)
