"""Synthetic AMASS-format dataset generator for smoke tests, quickstarts,
and quality studies — the full on-disk layout the loaders/CLIs expect
(reference `README.md` data-creation flow, `create_amass_dataset.py:262-302`
finishing steps) from random clips, no AMASS download.

Produces under ``<root>/datasets``:
    processed/AMASS/hmp/data_3d_amass.npz     train+test clips
    processed/AMASS/hmp/mmgt_<split>.txt      precomputed mm-GT neighbors
    processed/AMASS/hmp/mean_motion_test.txt  CMD class statistics
    annotations/AMASS/hmp/segments_test.csv   eval segment windows
    annotations/AMASS/hmp/mmapd_GT.csv        APDE ground-truth stub
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def make_synthetic_amass(
    root: str,
    *,
    obs_length: int = 6,
    pred_length: int = 15,
    train_datasets: Sequence[str] = ("ACCAD", "CMU"),
    test_datasets: Sequence[str] = ("DFaust",),
    files_per_dataset: int = 2,
    clip_len: int = 60,
    segment_stride: int = 9,
    multimodal_threshold: float = 0.4,
    amplitude: float = 0.3,
    num_joints: int = 22,
    pose_box_size: float = 1.1,
    seed: int = 0,
    dataset_name: str = "amass",
    dataset_dir: str = "AMASS",
) -> str:
    """Build the dataset tree; returns ``<root>/datasets`` (the value to
    pass as ``dataset_main_path=``).  Defaults match the 0.1 s/0.25 s @60 fps
    smoke task (``task.history_sec=0.1 task.prediction_horizon_sec=0.25``).
    For the 52-joint MANO variant pass ``num_joints=52,
    dataset_name='amass-mano', dataset_dir='AMASS-MANO'`` (the npz file name
    stays ``data_3d_amass.npz`` inside the variant folder, reference
    `amass.py:48` + `configs/.../dataset/amass-mano.yaml:7-8`)."""
    assert clip_len >= obs_length + pred_length + segment_stride, (
        clip_len, obs_length, pred_length)
    import pandas as pd

    ds_root = os.path.join(root, "datasets")
    pre = os.path.join(ds_root, "processed", dataset_dir, "hmp")
    ann = os.path.join(ds_root, "annotations", dataset_dir, "hmp")
    os.makedirs(pre, exist_ok=True)
    os.makedirs(ann, exist_ok=True)

    rng = np.random.default_rng(seed)
    positions = {
        ds: {
            fi: (rng.standard_normal((clip_len, num_joints, 3)) * amplitude
                 ).astype(np.float32)
            for fi in range(files_per_dataset)
        }
        for ds in (*train_datasets, *test_datasets)
    }
    np.savez(os.path.join(pre, "data_3d_amass.npz"), positions_3d=positions)

    rows = [
        {"dataset": ds, "file": f"f{fi}", "file_idx": fi,
         "pred_init": init, "pred_end": init + pred_length - 1}
        for ds in test_datasets
        for fi in range(files_per_dataset)
        for init in range(obs_length, clip_len - pred_length, segment_stride)
    ]
    segments_path = os.path.join(ann, "segments_test.csv")
    pd.DataFrame(rows).to_csv(segments_path, index=False)
    pd.DataFrame([{"id": i, "gt_APD": 1.0} for i in range(len(rows))]).to_csv(
        os.path.join(ann, "mmapd_GT.csv"), index=False
    )

    # finishing steps exactly as the real preprocessing CLI: mm-GT neighbor
    # file + CMD mean-motion statistics
    from ..skeleton import create_skeleton
    from .loaders import AMASSDataset
    from .preprocess.common import finalize_dataset

    skeleton = create_skeleton(
        dataset_name=dataset_name, motion_repr_type="SkeletonRescalePose",
        num_joints=num_joints, pose_box_size=pose_box_size, obs_length=obs_length,
        pred_length=pred_length, if_consider_hip=False,
    )
    finalize_dataset(
        AMASSDataset, skeleton,
        precomputed_folder=pre + "/",
        segments_path=segments_path,
        multimodal_threshold=multimodal_threshold,
        datasets=list(test_datasets),
        obs_length=obs_length, pred_length=pred_length, dtype="float32",
    )
    return ds_root
