"""Data pipeline tests on a synthetic AMASS-format fixture."""
import json
import os

import numpy as np
import pytest

from skeletondiffusion_tpu.data import (
    AMASSDataset,
    DataLoader,
    compute_multimodal_gt_for_dataset,
    get_multimodal_gt,
    preprocess_batch,
)
from skeletondiffusion_tpu.skeleton import create_skeleton

OBS, PRED, J = 6, 10, 22


@pytest.fixture(scope="module")
def skeleton():
    return create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=J,
        pose_box_size=1.5, obs_length=OBS, pred_length=PRED, if_consider_hip=False,
    )


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """Synthetic data_3d_amass.npz + test segments csv + mm-GT file."""
    root = tmp_path_factory.mktemp("amass")
    rng = np.random.default_rng(0)
    positions = {}
    for ds in ("ACCAD", "CMU"):
        positions[ds] = {}
        for fi in range(3):
            T = int(rng.integers(40, 80))
            positions[ds][fi] = rng.standard_normal((T, J, 3)).astype(np.float32) * 0.3
    np.savez(os.path.join(root, "data_3d_amass.npz"), positions_3d=positions)

    # test-split csv referencing a subset (format of segments_test.csv)
    import pandas as pd

    rows = []
    for ds in ("ACCAD", "CMU"):
        for fi in range(3):
            T = positions[ds][fi].shape[0]
            for init in range(OBS, T - PRED, 13):
                rows.append({"dataset": ds, "file": f"f{fi}", "file_idx": fi,
                             "pred_init": init, "pred_end": init + PRED - 1})
    pd.DataFrame(rows).to_csv(os.path.join(root, "segments_test.csv"), index=False)
    return str(root)


def test_train_dataset_and_loader(fixture_dir, skeleton):
    ds = AMASSDataset(
        datasets=["ACCAD", "CMU"], split="train", precomputed_folder=fixture_dir,
        skeleton=skeleton, obs_length=OBS, pred_length=PRED, stride=2, augmentation=1,
        da_mirroring=0.5, da_rotations=1.0, if_consider_hip=False, silent=True,
    )
    assert len(ds) > 0
    obs, pred, extra = ds[0]
    assert obs.shape == (OBS, J, 3) and pred.shape == (PRED, J, 3)

    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    batch = next(iter(dl))
    assert batch["obs"].shape == (4, OBS, J, 3)

    import jax

    obs_t, pred_t, _ = preprocess_batch(
        skeleton, jax.random.key(0), batch["obs"], batch["pred"],
        train=True, da_mirroring=0.5, da_rotations=1.0,
    )
    # input space drops the root joint
    assert obs_t.shape == (4, OBS, J - 1, 3)
    assert pred_t.shape == (4, PRED, J - 1, 3)
    # augmentation is rigid: limb lengths preserved in input space scale
    ll_raw = np.asarray(skeleton.extract_limb_length(
        np.asarray(skeleton.tranform_to_input_space(batch["pred"]))[..., :, :],
        mode="node"))
    ll_aug = np.asarray(skeleton.extract_limb_length(np.asarray(pred_t), mode="node"))
    np.testing.assert_allclose(np.sort(ll_aug[..., 0].ravel()), np.sort(ll_raw[..., 0].ravel()), atol=1e-4)


def test_test_split_segments_csv(fixture_dir, skeleton):
    ds = AMASSDataset(
        datasets=["ACCAD", "CMU"], split="test", precomputed_folder=fixture_dir,
        skeleton=skeleton, obs_length=OBS, pred_length=PRED,
        segments_path=os.path.join(fixture_dir, "segments_test.csv"),
        if_consider_hip=False, silent=True,
    )
    assert ds.stride == 1 and ds.augmentation == 0
    obs, pred, _ = ds[0]
    assert obs.shape == (OBS, J, 3)


def test_mmgt_roundtrip(fixture_dir, skeleton):
    ds = AMASSDataset(
        datasets=["ACCAD", "CMU"], split="test", precomputed_folder=fixture_dir,
        skeleton=skeleton, obs_length=OBS, pred_length=PRED,
        segments_path=os.path.join(fixture_dir, "segments_test.csv"),
        if_consider_hip=False, silent=True,
    )
    dest = os.path.join(fixture_dir, "mmgt_test.txt")
    mmgt = compute_multimodal_gt_for_dataset(ds, skeleton, multimodal_threshold=3.0, dest_path=dest)
    assert all(i in mmgt[j] for i in mmgt for j in mmgt[i]), "mm-GT must be symmetric"
    assert all(i in mmgt[i] for i in mmgt), "self always within threshold"

    # reload through the dataset path, padded collate carries masks
    ds2 = AMASSDataset(
        datasets=["ACCAD", "CMU"], split="test", precomputed_folder=fixture_dir,
        skeleton=skeleton, obs_length=OBS, pred_length=PRED,
        segments_path=os.path.join(fixture_dir, "segments_test.csv"),
        if_consider_hip=False, if_load_mmgt=True, silent=True,
    )
    assert ds2.max_mmgt_count >= 1
    dl = DataLoader(ds2, batch_size=3, shuffle=False)
    batch = next(iter(dl))
    assert batch["mm_gt"].shape[:2] == (3, ds2.max_mmgt_count)
    assert batch["mm_mask"][:, 0].all()

    # deduped collate (what the eval loop ships over the wire): gathering
    # the unique rows through mm_idx reproduces the dense collate exactly
    from skeletondiffusion_tpu.data.batch import MM_DEDUP_BUCKET

    dl_d = DataLoader(ds2, batch_size=3, shuffle=False, dedup_mm=True)
    batch_d = next(iter(dl_d))
    assert batch_d["mm_gt"].shape[0] % MM_DEDUP_BUCKET == 0
    assert batch_d["mm_idx"].shape == batch["mm_mask"].shape
    gathered = batch_d["mm_gt"][batch_d["mm_idx"]]
    np.testing.assert_array_equal(batch_d["mm_mask"], batch["mm_mask"])
    np.testing.assert_array_equal(
        gathered * batch["mm_mask"][:, :, None, None, None],
        batch["mm_gt"] * batch["mm_mask"][:, :, None, None, None],
    )

    # lazy mm (what eval_pipeline sets): items ship neighbor ids only and
    # collate pulls each unique future straight from the clip arrays —
    # bit-identical to the dense-item dedup collate
    ds2.mm_lazy = True
    try:
        _, _, extra = ds2[0]
        assert "mm_gt" not in extra and "mm_gt_idces" in extra
        batch_l = next(iter(DataLoader(ds2, batch_size=3, shuffle=False,
                                       dedup_mm=True)))
    finally:
        ds2.mm_lazy = False
    for key in ("mm_gt", "mm_idx", "mm_mask"):
        np.testing.assert_array_equal(batch_l[key], batch_d[key])


def test_chunked_mmgt_matches_direct(rng):
    frames = rng.standard_normal((50, 5, 3))
    full = get_multimodal_gt(frames, 1.5, chunk=64)
    chunked = get_multimodal_gt(frames, 1.5, chunk=7)
    assert full == chunked


def test_extended_obs_length_revalidation(fixture_dir, skeleton):
    """extended_obs_length shifts segment starts back and drops segments
    that would underrun their clip; reference `base_dataset.py:210-218`."""
    base = AMASSDataset(datasets=["ACCAD", "CMU"], split="test",
                        precomputed_folder=fixture_dir, skeleton=skeleton,
                        obs_length=OBS, pred_length=PRED,
                        segments_path=os.path.join(fixture_dir, "segments_test.csv"),
                        if_consider_hip=False, silent=True)
    ext = AMASSDataset(datasets=["ACCAD", "CMU"], split="test",
                       precomputed_folder=fixture_dir, skeleton=skeleton,
                       obs_length=OBS, pred_length=PRED, extended_obs_length=OBS + 2,
                       segments_path=os.path.join(fixture_dir, "segments_test.csv"),
                       if_consider_hip=False, silent=True)
    assert 0 < len(ext.segments) <= len(base.segments)
    obs, pred, extra = ext[0]
    assert obs.shape[0] == OBS + 2 and pred.shape[0] == PRED


def test_normalize_data_stats_path(fixture_dir, skeleton):
    """Standardize/normalize stats path (reference `base_dataset.py:221-271`
    + `src/core/utils/stats.py`) — the reference blocks it with an assert;
    here it must actually work and round-trip."""
    ds = AMASSDataset(
        datasets=["ACCAD"], split="train", precomputed_folder=fixture_dir,
        skeleton=skeleton, obs_length=OBS, pred_length=PRED,
        if_consider_hip=False, silent=True,
        normalize_data=True, normalize_type="standardize",
    )
    # statistics files materialized in the precomputed folder
    stats_dir = os.path.join(fixture_dir, "statistics")
    for f in ("mean_landmarks.npy", "var_landmarks.npy",
              "min_landmarks.npy", "max_landmarks.npy"):
        assert os.path.exists(os.path.join(stats_dir, f)), f

    obs, pred, _ = ds[0]
    # standardized output differs from raw and denormalize round-trips
    raw_obs, raw_pred = ds._get_segment(*ds.segments[0])
    assert not np.allclose(obs, raw_obs)
    np.testing.assert_allclose(ds.denormalize(obs), raw_obs, rtol=1e-4, atol=1e-5)
    # full-split standardization: ~zero mean, ~unit variance per landmark
    ps = np.concatenate([ds.normalize(a) for a in ds.annotations], axis=0)
    np.testing.assert_allclose(ps.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(ps.var(axis=0), 1.0, atol=1e-3)

    ds2 = AMASSDataset(
        datasets=["ACCAD"], split="train", precomputed_folder=fixture_dir,
        skeleton=skeleton, obs_length=OBS, pred_length=PRED,
        if_consider_hip=False, silent=True,
        normalize_data=True, normalize_type="normalize",
    )
    obs2, _, _ = ds2[0]
    assert obs2.min() >= -1.0 - 1e-6 and obs2.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(ds2.denormalize(obs2), raw_obs, rtol=1e-4, atol=1e-5)
    # denormalize with a landmark subset
    sub = ds2.denormalize(obs2[..., :5, :], idces=list(range(5)))
    np.testing.assert_allclose(sub, raw_obs[..., :5, :], rtol=1e-4, atol=1e-5)

    # mm-GT is normalized too (reference `motion_dataset.py:122-123`)
    if not os.path.exists(os.path.join(fixture_dir, "mmgt_test.txt")):
        tmp = AMASSDataset(
            datasets=["ACCAD", "CMU"], split="test", precomputed_folder=fixture_dir,
            skeleton=skeleton, obs_length=OBS, pred_length=PRED,
            segments_path=os.path.join(fixture_dir, "segments_test.csv"),
            if_consider_hip=False, silent=True,
        )
        compute_multimodal_gt_for_dataset(
            tmp, skeleton, multimodal_threshold=3.0,
            dest_path=os.path.join(fixture_dir, "mmgt_test.txt"),
        )
    ds3 = AMASSDataset(
        datasets=["ACCAD", "CMU"], split="test", precomputed_folder=fixture_dir,
        skeleton=skeleton, obs_length=OBS, pred_length=PRED,
        segments_path=os.path.join(fixture_dir, "segments_test.csv"),
        if_consider_hip=False, silent=True, if_load_mmgt=True,
        normalize_data=True, normalize_type="standardize",
    )
    _, pred3, extra3 = ds3[0]
    assert np.abs(extra3["mm_gt"]).max() < 20  # standardized scale


def test_mmgt_computed_in_metric_space(fixture_dir, skeleton, tmp_path):
    """Identical poses at different WORLD positions must be mm-GT neighbors:
    the threshold applies in the skeleton's metric space (hip-centered), not
    raw world coordinates (review finding; reference `math_utils.py:89`)."""
    from skeletondiffusion_tpu.data.mmgt import _to_metric_space, get_multimodal_gt

    rng = np.random.default_rng(5)
    pose = rng.standard_normal((1, 22, 3)) * 0.2
    # same pose, far-apart world translations
    frames_raw = np.concatenate([pose, pose + np.array([5.0, 0.0, 2.0])], axis=0)
    frames_m = _to_metric_space(skeleton, frames_raw)
    mmgt = get_multimodal_gt(frames_m, multimodal_threshold=0.1)
    assert mmgt[0] == [0, 1] and mmgt[1] == [0, 1]
    # raw world frames would never match
    mmgt_raw = get_multimodal_gt(frames_raw.reshape(2, -1, 3), multimodal_threshold=0.1)
    assert mmgt_raw[0] == [0]


def test_cycled_batches_epoch_length_semantics():
    """ignite epoch_length parity: an epoch of n iterations CYCLES the
    loader when one pass is shorter (reference `src/train.py` passes
    epoch_length=num_iter_perepoch); truncation would silently shrink it."""
    from skeletondiffusion_tpu.data.batch import cycled_batches

    class FakeLoader:
        def __init__(self):
            self.passes = 0

        def __iter__(self):
            self.passes += 1
            # distinct content per pass: a reshuffled DataLoader pass
            return iter([(self.passes, i) for i in range(3)])

    ld = FakeLoader()
    out = list(cycled_batches(ld, 8))
    assert len(out) == 8
    assert ld.passes == 3  # 3 + 3 + 2
    assert out[:3] == [(1, 0), (1, 1), (1, 2)] and out[6] == (3, 0)

    ld = FakeLoader()
    assert len(list(cycled_batches(ld, None))) == 3 and ld.passes == 1
    ld = FakeLoader()
    assert len(list(cycled_batches(ld, 2))) == 2 and ld.passes == 1

    class Empty:
        def __iter__(self):
            return iter(())

    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(cycled_batches(Empty(), 4))
