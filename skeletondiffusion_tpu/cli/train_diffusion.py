"""Stage-2 CLI: train the nonisotropic latent diffusion on top of a frozen
stage-1 AutoEncoder.

Reference entry point `train_diffusion.py:26-158` re-built TPU-native: the
frozen-AE embedding, k=50 fan-out, denoiser forward, k-best selection, Adam
and EMA updates all fuse into one jitted, data-parallel step.
"""
from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional

import jax
import numpy as np
import yaml

from ..data import DataLoader
from ..data.batch import bounded_batches, cycled_batches, prefetch_iterator
from ..diffusion.manager import create_diffusion
from ..metrics.body_realism import limb_length_variance
from ..metrics.multimodal import ade, apd, mpjpe
from ..parallel import replicate, shard_batch
from ..train.checkpoint import CheckpointManager, load_host_state, save_host_state
from ..train.trainer_diffusion import TrainerDiffusion
from ..utils import (
    MetricsLogger,
    flatten_config,
    load_and_merge_autoenc_cfg,
    load_config,
    save_config,
    set_seed,
)
from ..utils.reproducibility import epoch_key, iteration_key
from .common import (
    build_autoencoder,
    build_dataset,
    build_skeleton,
    make_eval_preprocess,
    make_train_preprocess,
    setup_mesh,
)


def load_frozen_autoencoder(cfg: Dict, skeleton):
    """Load + freeze the stage-1 checkpoint; reference
    `train_diffusion.py:47-51` + `src/utils/load.py:19-25`."""
    model = build_autoencoder(cfg, skeleton)
    path = cfg["pretrained_autoencoder_path"]
    ckpt = CheckpointManager(path if os.path.isdir(path) else os.path.dirname(path))
    import jax.numpy as jnp

    ex_x = jnp.zeros((2, cfg["obs_length"], skeleton.num_nodes, 3))
    ex_y = jnp.zeros((2, cfg["pred_length"], skeleton.num_nodes, 3))
    from ..models import AutoEncoder

    target = model.init(jax.random.key(0), ex_y, ex_x, ph=int(cfg["pred_length"]),
                        method=AutoEncoder.autoencode)
    # stored states hold (params, opt_state, step); restore params only
    restored = ckpt.restore_partial({"params": target}, ckpt.best_path())
    return model, jax.tree.map(jax.numpy.asarray, restored["params"])


def train(cfg: Dict) -> str:
    out_dir = cfg["output_log_path"]
    os.makedirs(out_dir, exist_ok=True)
    save_config(cfg, os.path.join(out_dir, "config.yaml"))
    from ..utils.config import snapshot_code

    snapshot_code(out_dir)
    logger = MetricsLogger(out_dir)

    from ..utils.debug import configure_debug

    configure_debug(cfg.get("if_debug_nans", False), cfg.get("if_enable_checks", False))
    root_key = set_seed(cfg["seed"])
    skeleton = build_skeleton(cfg)
    mesh = setup_mesh(cfg)

    dataset = build_dataset(cfg, skeleton, "train", "data_loader_train", rng_seed=cfg["seed"])
    loader = DataLoader(
        dataset, cfg["batch_size"], shuffle=cfg["data_loader_train"].get("shuffle", True),
        drop_last=cfg["data_loader_train"].get("drop_last", True), seed=cfg["seed"],
    )
    iter_per_epoch = cfg.get("num_iter_perepoch") or len(loader)
    preprocess = make_train_preprocess(skeleton, cfg["data_loader_train"])

    autoencoder, ae_params = load_frozen_autoencoder(cfg, skeleton)
    from .common import DIFFUSION_CFG_KEYS

    diffusion, denoiser = create_diffusion(skeleton, latent_size=cfg["latent_size"], **{
        k: v for k, v in cfg.items() if k in DIFFUSION_CFG_KEYS
    })

    trainer = TrainerDiffusion(
        diffusion=diffusion,
        autoencoder=autoencoder,
        ae_params=ae_params,
        lr=cfg["lr"],
        weight_decay=cfg.get("weight_decay", 0.0),
        train_pick_best_sample_among_k=cfg.get("train_pick_best_sample_among_k", 1),
        similarity_space=cfg.get("similarity_space", "latent_space"),
        if_use_ema=cfg.get("if_use_ema", True),
        ema_update_every=cfg.get("ema_update_every", 10),
        ema_decay=cfg.get("ema_decay", 0.995),
        ema_power=cfg.get("ema_power", 2 / 3),
        ema_min_value=cfg.get("ema_min_value", 0.0),
        step_start_ema=cfg.get("step_start_ema", 100),
        use_lr_scheduler=cfg.get("use_lr_scheduler", False),
        lr_scheduler_kwargs=cfg.get("lr_scheduler_kwargs"),
        prediction_horizon_eval=cfg["prediction_horizon_eval"],
        num_prob_samples=cfg.get("num_prob_samples", 50),
        skeleton=skeleton,
    )

    import jax.numpy as jnp

    N, L = skeleton.num_nodes, cfg["latent_size"]
    dparams = denoiser.init(
        jax.random.fold_in(root_key, 1), jnp.zeros((2, N, L)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, N, L)) if cfg.get("diffusion_conditioning", True) else None,
    )
    n_params = sum(p.size for p in jax.tree.leaves(dparams))
    print(f"Denoiser parameters: {n_params:,}")
    state = trainer.init(dparams)
    if mesh is not None:
        state = replicate(mesh, state)
        trainer.ae_params = replicate(mesh, trainer.ae_params)

    ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"), n_saved=10)
    start_epoch = 1
    resumed_step = None
    if cfg.get("if_resume_training"):
        state = ckpt.restore(state, cfg.get("load_path") or None)
        host = load_host_state(out_dir) or {}
        start_epoch = host.get("epoch", 0) + 1
        # the recomputed (epoch-1)·iter_per_epoch drifts when an epoch
        # yields fewer batches — trust the checkpointed step counter
        resumed_step = host.get("global_step")
        if trainer.lr_scheduler is not None and "lr_scheduler" in host:
            trainer.lr_scheduler.load_state_dict(host["lr_scheduler"])
        # bit-faithful resume: host RNG streams (see train_autoencoder)
        if "loader" in host:
            loader.load_state_dict(host["loader"])
        if "dataset" in host:
            dataset.load_state_dict(host["dataset"])

    it_global = resumed_step if resumed_step is not None else (
        (start_epoch - 1) * iter_per_epoch
    )
    eval_datasets = {}  # built once, reused every validation epoch
    for epoch in range(start_epoch, cfg["num_epochs"] + 1):
        trainer.epoch_started(epoch)
        ek = epoch_key(root_key, epoch)
        losses = []
        # bound BEFORE prefetching (see train_autoencoder: a break inside the
        # prefetch generator breaks bit-faithful resume + pins device buffers)
        # ignite epoch_length parity: an epoch is EXACTLY iter_per_epoch
        # iterations, cycling the loader when one pass is shorter
        bounded = cycled_batches(loader, iter_per_epoch)
        for it, batch in enumerate(prefetch_iterator(bounded, to_device=True)):
            # independent keys for augmentation vs the train step (see
            # train_autoencoder: split's prefix property couples the streams
            # bit-exactly if one key is reused — every item's mirror flip
            # would be encoded in the diffusion noise signs)
            k_pre, k_step = jax.random.split(iteration_key(ek, it))
            obs_t, pred_t, _ = preprocess(k_pre, batch["obs"], batch["pred"])
            if mesh is not None:
                obs_t, pred_t = shard_batch(mesh, obs_t), shard_batch(mesh, pred_t)
            state, loss = trainer.train_step(state, k_step, (obs_t, pred_t))
            # keep the device scalar; float() is deferred to the logging
            # cadence / epoch end — a per-step float(loss) blocks dispatch on
            # one host↔device round-trip per step, which dominates the loop
            # on remote/tunneled devices
            losses.append(loss)
            # per-iteration loss/lr + param/grad norms every 100 iterations
            # (reference `src/utils/tensorboard.py:58-122`)
            if it_global % cfg.get("log_every_iters", 10) == 0:
                logger.log(it_global, {
                    "loss": float(losses[-1]),
                    "lr": trainer.lr_scheduler._current if trainer.lr_scheduler else cfg["lr"],
                    "epoch": epoch,
                }, prefix="train_iter")
            logger.log_param_norms(it_global, state.params,
                                   grad_norm=trainer.last_grad_norm)
            it_global += 1
        logger.log(epoch, {"loss": float(np.mean(jax.device_get(losses))),
                           "lr": trainer.lr_scheduler._current if trainer.lr_scheduler else cfg["lr"]})
        # per-epoch weight histograms/norms (reference `tensorboard.py:98-122`)
        logger.log_param_histograms(epoch, state.params)

        # reference runs BOTH eval engines every `eval_frequency` epochs
        # (`train_diffusion.py:113-120`, `src/train_utils.py:97-137`)
        score = None
        if cfg.get("if_run_validation") and epoch % cfg.get("eval_frequency", 25) == 0:
            score = -validate(cfg, skeleton, trainer, state, logger, epoch,
                              dataset_cache=eval_datasets)
            validate(
                cfg, skeleton, trainer, state, logger, epoch,
                split="train", loader_key="data_loader_train_eval",
                max_batches=cfg.get("num_iteration_eval") or None,
                prefix="train_eval", dataset_cache=eval_datasets,
            )
        if score is not None or epoch == cfg["num_epochs"]:
            ckpt.save(state, step=epoch, score=score)
        ckpt.save_latest(state, step=epoch)
        # bit-faithful resume: host RNG streams alongside epoch/step
        # (matches train_autoencoder; reference `reproducibility.py:47-79`)
        host = {
            "epoch": epoch,
            "global_step": it_global,
            "loader": loader.state_dict(),
            "dataset": dataset.state_dict(),
        }
        if trainer.lr_scheduler is not None:
            host["lr_scheduler"] = trainer.lr_scheduler.state_dict()
        save_host_state(out_dir, host)
    logger.close()
    return out_dir


def validate(cfg, skeleton, trainer, state, logger, epoch, split="valid",
             loader_key="data_loader_valid", max_batches=None, prefix="valid",
             dataset_cache=None) -> float:
    """Sample 50 with the EMA model, decode, APD/ADE/MPJPE on a split;
    reference `src/train_utils.py:97-137` (same engine attached to the valid
    split and, capped at ``num_iteration_eval`` batches, to the train
    split).  ``dataset_cache``: per-run dict so the eval datasets (full npz
    re-read + segment generation) are built once, not every validation."""
    if loader_key not in cfg:
        loader_key = "data_loader_valid"
    if dataset_cache is not None and (split, loader_key) in dataset_cache:
        dataset = dataset_cache[(split, loader_key)]
    else:
        dataset = build_dataset(cfg, skeleton, split, loader_key)
        if dataset_cache is not None:
            dataset_cache[(split, loader_key)] = dataset
    loader = DataLoader(dataset, cfg["batch_size_eval"], shuffle=False)
    preprocess = make_eval_preprocess(skeleton)
    vals = {"ADE": [], "APD": [], "MPJPE": [], "LLVar": []}
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        obs_t, pred_t, _ = preprocess(jax.random.key(0), batch["obs"], batch["pred"])
        out, y, samples, x = trainer.validation_step(state, jax.random.key(epoch), (obs_t, pred_t))
        pred_m = skeleton.transform_to_metric_space(out)
        y_m = skeleton.transform_to_metric_space(y)
        vals["ADE"].append(np.asarray(ade(y_m, pred_m)))
        vals["APD"].append(np.asarray(apd(pred_m)))
        vals["MPJPE"].append(np.asarray(mpjpe(y_m, pred_m)))
        vals["LLVar"].append(
            np.atleast_1d(np.asarray(limb_length_variance(pred_m, skeleton.get_limbseq(), mode="mean")))
        )
    results = {k: float(np.concatenate(v).mean()) for k, v in vals.items()}
    logger.log(epoch, results, prefix=prefix)
    print(f"[epoch {epoch}] {prefix}:", results)
    return results["ADE"]


def main(argv: Optional[List[str]] = None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = os.environ.get("SKELDIFF_CONFIG_DIR", "configs/config_train_diffusion")
    cfg = load_config(config_dir, argv)
    # inherit the autoencoder experiment's stored config (reference
    # `train_diffusion.py:134-150` + `src/utils/config.py:14-31`)
    flat = flatten_config(cfg)
    ae_dir = flat["pretrained_autoencoder_path"].rstrip("/")
    ae_cfg_path = os.path.join(os.path.dirname(ae_dir), "config.yaml")
    if not os.path.exists(ae_cfg_path):
        # path points at a specific checkpoint (<exp>/checkpoints/ckpt_N,
        # supported by load_frozen_autoencoder) → config sits two levels up
        ae_cfg_path = os.path.join(
            os.path.dirname(os.path.dirname(ae_dir)), "config.yaml"
        )
    merged = load_and_merge_autoenc_cfg(flat, os.path.abspath(ae_cfg_path))
    return train(merged)


if __name__ == "__main__":
    main()
