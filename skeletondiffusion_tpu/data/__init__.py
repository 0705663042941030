"""Data pipeline (L4): datasets, loaders, device-side batch preprocessing,
and offline statistics (mm-GT, CMD mean motions)."""
from .batch import DataLoader, collate, preprocess_batch
from .dataset import BaseDataset, MotionDataset
from .loaders import (
    DATASET_CLASSES,
    AMASSDataset,
    D3PWZeroShotDataset,
    FreeManDataset,
    H36MDataset,
    ZeroShotAMASSDataset,
)
from .mmgt import (
    compute_mean_motions,
    compute_multimodal_gt_for_dataset,
    get_multimodal_gt,
    save_mmgt,
)

__all__ = [
    "AMASSDataset", "BaseDataset", "DATASET_CLASSES", "D3PWZeroShotDataset",
    "DataLoader", "FreeManDataset", "H36MDataset", "MotionDataset",
    "ZeroShotAMASSDataset", "collate", "compute_mean_motions",
    "compute_multimodal_gt_for_dataset", "get_multimodal_gt",
    "preprocess_batch", "save_mmgt",
]
