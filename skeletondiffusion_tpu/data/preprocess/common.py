"""Shared finishing steps for dataset creation: stats + multimodal GT;
reference `src/data/loaders/base/create_dataset_utils.py:12-66`."""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


def save_positions_npz(output_path: str, positions: Dict, compressed: bool = True):
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    save = np.savez_compressed if compressed else np.savez
    save(output_path, positions_3d=positions)


def finalize_dataset(
    dataset_cls,
    skeleton,
    precomputed_folder: str,
    segments_path: str,
    multimodal_threshold: float,
    split: str = "test",
    **dataset_kwargs,
):
    """Compute mean_motion_test.txt + mmgt_<split>.txt for a freshly created
    dataset; reference `create_amass_dataset.py:262-302`."""
    from ..mmgt import compute_mean_motions, compute_multimodal_gt_for_dataset

    dataset = dataset_cls(
        split=split, precomputed_folder=precomputed_folder, skeleton=skeleton,
        segments_path=segments_path, if_consider_hip=False, silent=True, **dataset_kwargs,
    )
    dest_mm = os.path.join(precomputed_folder, "mean_motion_test.txt")
    if not os.path.exists(dest_mm):
        class_average, motions, freqs = compute_mean_motions(dataset)
        with open(dest_mm, "w") as fh:
            fh.write("\n".join(
                f"{c},{m},{f}" for c, m, f in zip(class_average.keys(), motions, freqs)
            ))
    dest_mmgt = os.path.join(precomputed_folder, f"mmgt_{split}.txt")
    if not os.path.exists(dest_mmgt):
        compute_multimodal_gt_for_dataset(
            dataset, skeleton, multimodal_threshold=multimodal_threshold, dest_path=dest_mmgt
        )
    return dataset
