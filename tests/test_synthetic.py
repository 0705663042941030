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
