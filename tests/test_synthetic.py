"""The packaged synthetic-dataset generator produces the full on-disk layout
the loaders and CLIs expect (quickstart path)."""
import os

import numpy as np


def test_make_synthetic_amass_layout_and_loadable(tmp_path):
    from skeletondiffusion_tpu.data.synthetic import make_synthetic_amass

    ds_root = make_synthetic_amass(str(tmp_path))
    pre = os.path.join(ds_root, "processed", "AMASS", "hmp")
    ann = os.path.join(ds_root, "annotations", "AMASS", "hmp")
    for f in ("data_3d_amass.npz", "mmgt_test.txt", "mean_motion_test.txt"):
        assert os.path.exists(os.path.join(pre, f)), f
    for f in ("segments_test.csv", "mmapd_GT.csv"):
        assert os.path.exists(os.path.join(ann, f)), f

    from skeletondiffusion_tpu.data import AMASSDataset
    from skeletondiffusion_tpu.skeleton import create_skeleton

    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose",
        num_joints=22, pose_box_size=1.1, obs_length=6, pred_length=15,
        if_consider_hip=False,
    )
    ds = AMASSDataset(
        datasets=["DFaust"], split="test", precomputed_folder=pre + "/",
        skeleton=skeleton, obs_length=6, pred_length=15,
        segments_path=os.path.join(ann, "segments_test.csv"),
        if_consider_hip=False, if_load_mmgt=True, if_compute_cmd=True,
        silent=True,
    )
    assert len(ds) > 0
    obs, pred, extras = ds[0]
    # raw items keep all 22 joints; the hip is dropped by the device-side
    # input transform, not the loader
    assert obs.shape == (6, 22, 3) and pred.shape == (15, 22, 3)
    assert "mm_gt" in extras and ds.mean_motion_per_class is not None
    assert np.isfinite(obs).all() and np.isfinite(pred).all()


def test_motion_generator_properties():
    """The convergence-capstone generator produces rigid-limb, human-scale,
    learnable motion: constant bone lengths (limb-realism metrics meaningful),
    class-dependent speeds (CMD classes distinct), and futures that continue
    smoothly from the observation (a gait model can beat ZeroVelocity)."""
    from skeletondiffusion_tpu.data.synthetic import (
        _AMASS22_PARENTS,
        _generate_motion_clip,
    )

    rng = np.random.default_rng(0)
    speeds = []
    for c in range(4):
        clip = _generate_motion_clip(rng, 240, 60.0, c)
        assert clip.shape == (240, 22, 3) and np.isfinite(clip).all()
        for child, parent in _AMASS22_PARENTS.items():
            d = np.linalg.norm(clip[:, child] - clip[:, parent], axis=-1)
            assert d.std() < 1e-5 and 0.03 < d.mean() < 0.5, (child, d.mean())
        # human scale: head above feet, overall height ~1.4-1.9 m
        height = clip[..., 2].max() - clip[..., 2].min()
        assert 1.2 < height < 2.1, height
        # smooth: per-frame displacement bounded (no teleports)
        step = np.linalg.norm(np.diff(clip, axis=0), axis=-1)
        assert step.max() < 0.2, step.max()  # brisk arm swing peaks ~8 m/s
        speeds.append(np.linalg.norm(np.diff(clip[:, 0], axis=0), axis=-1).mean())
    # classes genuinely differ in root speed
    assert max(speeds) > 3 * min(speeds), speeds


def test_make_synthetic_amass_motion_layout(tmp_path):
    from skeletondiffusion_tpu.data.synthetic import make_synthetic_amass_motion

    ds_root = make_synthetic_amass_motion(
        str(tmp_path), obs_length=6, pred_length=15, clip_len=60,
        files_per_dataset=2, test_segment_stride=12,
        multimodal_threshold=5.0,  # tiny fixture: force non-singleton mm-GT
        train_datasets=("ACCAD",), valid_datasets=("HumanEva",),
        test_datasets=("DFaust",),
    )
    pre = os.path.join(ds_root, "processed", "AMASS", "hmp")
    ann = os.path.join(ds_root, "annotations", "AMASS", "hmp")
    for f in ("data_3d_amass.npz", "mmgt_test.txt", "mean_motion_test.txt"):
        assert os.path.exists(os.path.join(pre, f)), f
    # real (non-stub) mmapd: per-segment APD of the mm-GT sets, row count
    # matching the segment csv
    import pandas as pd

    segments = pd.read_csv(os.path.join(ann, "segments_test.csv"))
    mmapd = pd.read_csv(os.path.join(ann, "mmapd_GT.csv"))
    assert len(mmapd) == len(segments) > 0
    assert (mmapd["gt_APD"] >= 0).all() and np.isfinite(mmapd["gt_APD"]).all()
    assert mmapd["gt_APD"].max() > 0  # at least one multimodal neighborhood
