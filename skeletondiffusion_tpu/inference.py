"""Notebook / plug-and-play inference API.

Mirrors the reference's notebook workflow (`Inference Example.ipynb` +
`src/inference_utils.py:23-51`): load a trained experiment folder, transform
raw 3D poses to input space, predict 50 futures, rank them.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np
import yaml

from .cli.eval import prepare_model
from .metrics.ranking import get_closest_and_nfurthest_maxapd
from .skeleton import create_skeleton
from .utils.config import flatten_config, load_config


def load_model_config_exp(checkpoint_path: str) -> Tuple[Dict, str]:
    """Experiment config from a checkpoint path; reference
    `inference_utils.py:15-21`.

    Orbax checkpoints are DIRECTORIES, so an isdir test alone cannot tell an
    experiment folder from a checkpoint inside it: walk up until a
    ``config.yaml`` is found (experiment dir → 0 hops, ``<exp>/checkpoints``
    → 1, ``<exp>/checkpoints/ckpt_100`` → 2, a file inside → 3)."""
    probe = checkpoint_path if os.path.isdir(checkpoint_path) else os.path.dirname(checkpoint_path)
    for _ in range(4):
        if os.path.exists(os.path.join(probe, "config.yaml")):
            with open(os.path.join(probe, "config.yaml")) as f:
                return yaml.safe_load(f), probe
        parent = os.path.dirname(probe.rstrip(os.sep))
        if parent == probe:
            break
        probe = parent
    raise FileNotFoundError(
        f"no experiment config.yaml found at or above {checkpoint_path!r}"
    )


def quick_cfg_for_inference(
    checkpoint_path: str, dataset_name: str, num_samples: int = 50,
    config_dir: str = "configs/config_eval", overrides=None,
) -> Dict:
    """Reference `inference_utils.py:23-51` without Hydra.  ``overrides``:
    extra dotted CLI-style overrides (e.g. ``["task.history_sec=0.1"]``)."""
    cfg = flatten_config(
        load_config(config_dir, [
            f"dataset={dataset_name}", "dataset_split=valid", "stats_mode=deterministic",
            f"num_samples={num_samples}", "batch_size=1",
            f"checkpoint_path={checkpoint_path}",
            *(overrides or []),
        ])
    )
    cfg_orig, exp_folder = load_model_config_exp(checkpoint_path)
    # stored experiment config fills everything the eval tree does not set;
    # train-owned keys (pose_box_size, seq_centering, arch, …) are absent
    # from the eval tree so the checkpoint's values win (reference
    # `eval.py:161-166` semantics)
    merged = dict(cfg_orig)
    merged.update(cfg)
    # a checkpoint FILE path resolves to its experiment folder here —
    # prepare_model expects the folder (it restores the best checkpoint)
    merged["checkpoint_path"] = exp_folder
    return merged


class InferenceSession:
    """obs [T,J,3] or [B,T,J,3] raw metric poses → ranked predicted futures."""

    def __init__(self, checkpoint_path: str, dataset_name: str = "amass",
                 num_samples: int = 50, config_dir: str = "configs/config_eval",
                 overrides=None):
        cfg = quick_cfg_for_inference(checkpoint_path, dataset_name, num_samples,
                                      config_dir, overrides=overrides)
        self.cfg = cfg
        self.skeleton = create_skeleton(
            dataset_name=cfg["dataset_name"], motion_repr_type=cfg["motion_repr_type"],
            num_joints=cfg["num_joints"], pose_box_size=cfg.get("pose_box_size", 1.5),
            obs_length=cfg["obs_length"], pred_length=cfg["pred_length"],
            if_consider_hip=cfg["if_consider_hip"],
            seq_centering=cfg.get("seq_centering", 0),
        )
        self.predictor = prepare_model(cfg, self.skeleton)
        self.num_samples = num_samples

    def predict(self, obs_raw: np.ndarray, rng: Optional[jax.Array] = None) -> np.ndarray:
        """Raw metric-space observation → metric-space predictions
        [B, S, T, N, 3]."""
        single = obs_raw.ndim == 3
        if single:
            obs_raw = obs_raw[None]
        obs = self.skeleton.tranform_to_input_space(obs_raw)
        rng = rng if rng is not None else jax.random.key(0)
        pred, _ = self.predictor(rng, obs)
        pred_m = np.asarray(self.skeleton.transform_to_metric_space(pred))
        return pred_m[0] if single else pred_m

    def rank(self, pred: np.ndarray, target_raw: np.ndarray, n_diverse: int = 5):
        """Closest-to-GT + n most diverse samples; reference
        `src/metrics/ranking.py:17-63` workflow."""
        target_m = np.asarray(
            self.skeleton.transform_to_metric_space(
                self.skeleton.tranform_to_input_space(target_raw)
            )
        )
        return get_closest_and_nfurthest_maxapd(pred, target_m, n_diverse)
