"""Shared CLI plumbing: skeleton/dataset/model construction from a flattened
config (the reference's `src/train_utils.py` + `src/inference_utils.py`
factories)."""
from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict

import jax

from ..data import DATASET_CLASSES
from ..data.batch import preprocess_batch
from ..models import AutoEncoder
from ..parallel import create_mesh, maybe_initialize_distributed
from ..skeleton import create_skeleton


def build_skeleton(cfg: Dict[str, Any]):
    return create_skeleton(
        dataset_name=cfg["dataset_name"],
        motion_repr_type=cfg["motion_repr_type"],
        num_joints=cfg["num_joints"],
        pose_box_size=cfg.get("pose_box_size", 1.5),
        obs_length=cfg["obs_length"],
        pred_length=cfg["pred_length"],
        if_consider_hip=cfg["if_consider_hip"],
        seq_centering=cfg.get("seq_centering", 0),
    )


def build_dataset(cfg: Dict[str, Any], skeleton, split: str, loader_key: str, **extra):
    ds_cls = DATASET_CLASSES[cfg["dataset_type"]]
    loader_cfg = dict(cfg[loader_key])
    loader_cfg.pop("shuffle", None)
    loader_cfg.pop("drop_last", None)
    kwargs = dict(
        split=split,
        precomputed_folder=cfg["precomputed_folder"],
        skeleton=skeleton,
        obs_length=cfg["obs_length"],
        pred_length=cfg["pred_length"],
        if_consider_hip=cfg["if_consider_hip"],
        dtype=cfg.get("dtype", "float32"),
        annotations_folder=cfg.get("annotations_folder"),
        silent=cfg.get("silent", False),
        **loader_cfg,
        **extra,
    )
    if cfg["dataset_type"] != "H36MDataset":
        kwargs.pop("subjects", None)
    if cfg["dataset_type"] in ("AMASSDataset",):
        kwargs.pop("actions", None)
        kwargs.pop("annotations_folder", None)
    # the hmp pipeline assumes RAW metric-space coordinates: the device-side
    # augmentation (mirror/rotation), noisy-obs, skeleton input transforms
    # and the mm/CMD reference statistics are all incoherent on standardized
    # data.  The dataset-level stats path (normalize/denormalize) works
    # standalone; the reference blocks the same combination with
    # `assert not normalize_data` (`base_dataset.py:56`).
    if kwargs.get("normalize_data") and cfg.get("task_name", "hmp") == "hmp":
        raise ValueError(
            "normalize_data=True is incompatible with the hmp pipeline "
            "(device-side augmentation + skeleton transforms assume raw "
            "metric space); use the dataset-level normalize/denormalize "
            "API directly instead"
        )
    return ds_cls(**kwargs)


def build_autoencoder(cfg: Dict[str, Any], skeleton) -> AutoEncoder:
    arch = dict(cfg["autoenc_arch"])
    arch.pop("arch", None)
    return AutoEncoder(
        num_nodes=skeleton.num_nodes,
        latent_size=cfg["latent_size"],
        node_types=skeleton.nodes_type_id,
        output_size=cfg.get("output_size", 3),
        z_activation=cfg.get("z_activation", "tanh"),
        loss_pose_type=cfg.get("loss_pose_type", "l1"),
        compute_dtype=cfg.get("compute_dtype"),
        **arch,
    )


def make_train_preprocess(skeleton, loader_cfg: Dict[str, Any]):
    """One jitted device-side preprocess closure for the training loader."""
    return jax.jit(
        partial(
            preprocess_batch,
            skeleton,
            train=True,
            da_mirroring=loader_cfg.get("da_mirroring", 0.0),
            da_rotations=loader_cfg.get("da_rotations", 0.0),
        )
    )


def make_eval_preprocess(skeleton):
    return jax.jit(partial(preprocess_batch, skeleton, train=False))


def setup_mesh(cfg: Dict[str, Any]):
    maybe_initialize_distributed()
    mesh_cfg = cfg.get("device_mesh") or {}
    n = mesh_cfg.get("n_devices") or len(jax.devices())
    if n <= 1:
        return None
    return create_mesh(n, model_parallel=mesh_cfg.get("model_parallel", 1))


# the stored-config keys create_diffusion consumes — ONE list shared by the
# train and eval CLIs so a new key can't silently reach only one of them
# (a drifted copy means eval reconstructs the process with a default that
# differs from training: a checkpoint-true violation with no error)
DIFFUSION_CFG_KEYS = (
    "diffusion_type", "covariance_matrix_type", "reachability_matrix_degree_factor",
    "reachability_matrix_stop_at", "if_sigma_n_scale", "sigma_n_scale",
    "if_run_as_isotropic", "diffusion_conditioning", "diffusion_timesteps",
    "diffusion_objective", "beta_schedule", "beta_schedule_factor",
    "diffusion_covariance_type", "gamma_scheduler", "loss_reduction_type",
    "diffusion_loss_type", "diffusion_activation", "diffusion_arch",
    "sampling_timesteps", "ddim_sampling_eta", "compute_dtype", "remat_denoiser",
)
