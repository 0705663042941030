"""Flagship eval CLI: full probabilistic metric suite over a test split.

    python eval.py dataset=amass checkpoint_path=<exp_dir> stats_mode=probabilistic

Reference entry point `eval.py:128-196` — method plugins selected by name
(`eval.py:154-159`): SkeletonDiffusion (trained model) or the ZeroVelocity
algorithmic baseline.
"""
from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional

import jax
import numpy as np
import yaml

from ..diffusion.manager import create_diffusion
from ..eval_pipeline import (
    SkeletonDiffusionPredictor,
    ZeroVelocityPredictor,
    compute_metrics,
)
from ..metrics.suite import draw_table
from ..train.checkpoint import CheckpointManager
from ..utils import AverageTimer, ResultStorer, flatten_config, load_config
from .common import build_dataset, build_skeleton, setup_mesh
from .train_diffusion import load_frozen_autoencoder


def merge_experiment_cfg(cfg: Dict) -> Dict:
    """Merge the stored experiment config UNDER the current eval config
    (eval keys win on intersection, stored training values fill the rest —
    reference `eval.py:161-166` + `src/utils/config.py:23-31`).

    Must run BEFORE skeleton/dataset construction so train-owned task keys
    (pose_box_size, seq_centering, latent size, arch, …) come from the
    checkpoint, not from eval-tree defaults.
    """
    exp_dir = cfg.get("checkpoint_path") or ""
    assert exp_dir and os.path.isdir(exp_dir), (
        "checkpoint_path must point to a trained experiment directory "
        f"(containing config.yaml + checkpoints/); got {exp_dir!r}. "
        "Pass it as: python eval.py checkpoint_path=<exp_dir> …"
    )
    with open(os.path.join(exp_dir, "config.yaml")) as f:
        train_cfg = yaml.safe_load(f)
    merged = dict(train_cfg)
    merged.update(cfg)
    return merged


def prepare_model(cfg: Dict, skeleton):
    """Load AE + diffusion checkpoints into a predictor; reference
    `src/eval_prepare_model.py:54-85`.  ``cfg`` must already contain the
    stored experiment config (see ``merge_experiment_cfg``)."""
    exp_dir = cfg["checkpoint_path"]
    autoencoder, ae_params = load_frozen_autoencoder(cfg, skeleton)
    from .common import DIFFUSION_CFG_KEYS

    diffusion, denoiser = create_diffusion(skeleton, latent_size=cfg["latent_size"], **{
        k: v for k, v in cfg.items() if k in DIFFUSION_CFG_KEYS
    })
    import jax.numpy as jnp

    N, L = skeleton.num_nodes, cfg["latent_size"]
    target_params = denoiser.init(
        jax.random.key(0), jnp.zeros((2, N, L)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, N, L)) if cfg.get("diffusion_conditioning", True) else None,
    )
    ckpt_dir = os.path.join(exp_dir, "checkpoints_diffusion")
    if not os.path.isdir(ckpt_dir):
        ckpt_dir = os.path.join(exp_dir, "checkpoints")
    ckpt = CheckpointManager(ckpt_dir)
    # evaluate with EMA weights when present (reference samples with the EMA
    # model, `src/core/trainer.py:304-307`)
    if cfg.get("if_use_ema", True):
        restored = ckpt.restore_partial({"ema": {"params": target_params}}, ckpt.best_path())
        diff_params = restored["ema"]["params"]
    else:
        restored = ckpt.restore_partial({"params": target_params}, ckpt.best_path())
        diff_params = restored["params"]
    return SkeletonDiffusionPredictor(
        skeleton, autoencoder, ae_params, diffusion, jax.tree.map(jax.numpy.asarray, diff_params),
        num_samples=cfg.get("num_samples", 50),
        pred_length=cfg["pred_length"],
        diffusion_conditioning=cfg.get("diffusion_conditioning", True),
    )


def main(argv: Optional[List[str]] = None) -> Dict[str, float]:
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = os.environ.get("SKELDIFF_CONFIG_DIR", "configs/config_eval")
    cfg = flatten_config(load_config(config_dir, argv))

    method = cfg.get("method_name", "SkeletonDiffusion")
    if method == "SkeletonDiffusion":
        # checkpoint-true: stored experiment config resolved BEFORE any
        # skeleton/dataset/model construction (reference `eval.py:161-166`)
        cfg = merge_experiment_cfg(cfg)
        if cfg.get("compute_dtype") not in (None, "float32"):
            print(
                f"note: network compute_dtype={cfg['compute_dtype']} "
                "(measured metric deltas vs fp32: docs/bf16_eval_quality.json); "
                "for strict fp32 parity pass compute_dtype=null"
            )

    skeleton = build_skeleton(cfg)
    mesh = setup_mesh(cfg)
    split = cfg.get("dataset_split", "test")
    loader_key = f"data_loader_{split}"
    if loader_key not in cfg:
        loader_key = "data_loader_test"
    # CMD needs the test split's mean-motion statistics and class labels
    # (reference gates identically, `config_metrics.py:86`)
    if_compute_cmd = bool(cfg.get("if_compute_cmd", False)) and split == "test"
    dataset = build_dataset(
        cfg, skeleton, split, loader_key,
        if_long_term_test=cfg.get("if_long_term_test", False),
        long_term_factor=cfg.get("long_term_factor", 2.5),
        if_compute_cmd=if_compute_cmd,
        if_noisy_obs=cfg.get("if_noisy_obs", False),
        noise_level=cfg.get("noise_level", 0.25),
        noise_std=cfg.get("noise_std", 0.02),
    )

    if method == "SkeletonDiffusion":
        predictor = prepare_model(cfg, skeleton)
    elif method == "ZeroVelocity":
        predictor = ZeroVelocityPredictor(
            skeleton, num_samples=cfg.get("num_samples", 50), pred_length=cfg["pred_length"]
        )
    else:
        raise NotImplementedError(method)

    # FID: h36m test split only, needs the pretrained classifier checkpoint in
    # the precomputed folder (reference `config_metrics.py:59,83-87`)
    fid_params = None
    if (
        cfg.get("if_compute_fid")
        and cfg.get("dataset_name") == "h36m"
        and cfg.get("dataset_split", "test") == "test"
    ):
        clf_path = os.path.join(cfg["precomputed_folder"], "h36m_classifier.pth")
        if os.path.exists(clf_path):
            import torch

            from ..metrics.fid import port_classifier

            state = torch.load(clf_path, map_location="cpu")["model"]
            sd = {k: v.numpy() for k, v in state.items()}
            fid_params = {"params": port_classifier(sd)}
        else:
            print(f"if_compute_fid set but classifier missing at {clf_path}; skipping FID")

    timer = AverageTimer() if cfg.get("if_measure_time") else None
    # on-device profiling (SURVEY §5: the reference only has wall-clock
    # timing; the TPU-native equivalent is a jax.profiler trace).
    # profile_trace is a context manager with a finally-guarded stop, so a
    # failing eval never leaves a dangling trace session.
    from ..utils.debug import profile_trace

    prof_dir = None
    if cfg.get("if_profile"):
        prof_dir = os.path.join(cfg.get("checkpoint_path") or ".", "profile")
    store = None
    if cfg.get("if_store_output"):
        store = ResultStorer(cfg["store_output_path"], store_gt=cfg.get("if_store_gt", False))

    with profile_trace(prof_dir):
        results = compute_metrics(
            predictor, dataset, skeleton,
            batch_size=cfg["batch_size"],
            num_samples=cfg.get("num_samples", 50),
            stats_mode=cfg.get("stats_mode", "deterministic"),
            seed=cfg.get("seed", 0),
            if_compute_cmd=if_compute_cmd,
            if_compute_apde=cfg.get("if_compute_apde", False),
            mmapd_gt_path=os.path.join(cfg["annotations_folder"], "mmapd_GT.csv")
            if cfg.get("if_compute_apde") else None,
            if_long_term_test=cfg.get("if_long_term_test", False),
            long_term_factor=cfg.get("long_term_factor", 2.5),
            long_term_strategy=cfg.get("long_term_strategy", "best_every50"),
            long_term_refeed_space=cfg.get("long_term_refeed_space", "input"),
            pred_length=cfg.get("pred_length"),
            if_noisy_obs=cfg.get("if_noisy_obs", False),
            noise_level=cfg.get("noise_level", 0.25),
            noise_std=cfg.get("noise_std", 0.02),
            store=store,
            timer=timer,
            ndebug=bool(int(os.environ.get("NDEBUG", "0"))),
            fid_classifier_params=fid_params,
            mesh=mesh,
        )
    if prof_dir is not None:
        print("profiler trace written to", prof_dir)
    print(draw_table(results))
    if timer is not None:
        print("timing:", timer.summary())
    if cfg.get("results_path"):
        out_path = cfg["results_path"]
    else:
        # eval out-folder naming mirrors the reference (device name + seed +
        # long-term/noise labels, `src/eval_prepare_model.py:18-24`)
        dev = jax.devices()[0]
        dev_name = f"{dev.platform}-{getattr(dev, 'device_kind', '')}".replace(" ", "_")
        lt = f"_longterm{cfg.get('long_term_factor')}" if cfg.get("if_long_term_test") else ""
        nz = (
            f"_noisyobs{cfg.get('noise_level')}-{cfg.get('noise_std')}"
            if cfg.get("if_noisy_obs") else ""
        )
        out_dir = os.path.join(
            cfg.get("checkpoint_path") or ".",
            f"eval_{cfg['dataset_name']}_{cfg['batch_size']}{lt}{nz}",
            cfg.get("dataset_split", "test"), f"{dev_name}_seed{cfg.get('seed', 0)}",
        )
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, f"results_{cfg.get('stats_mode')}.yaml")
    try:
        with open(out_path, "w") as f:
            yaml.safe_dump({k: float(v) for k, v in results.items()}, f)
    except OSError as e:
        # metrics already printed — losing the yaml must not fail the run,
        # but say so (a silent pass here once hid a bad results_path)
        print(f"warning: could not write results yaml to {out_path}: {e}")
    return results


if __name__ == "__main__":
    main()
