"""Stage-1 CLI: train the graph-recurrent AutoEncoder.

    python train_autoencoder.py dataset=amass model.num_epochs=200 ...

Reference entry point `train_autoencoder.py:26-143` (Hydra CLI + ignite
Engine) re-built as a plain epoch loop over a jitted train step with Orbax
checkpointing, JSONL logging and data-parallel sharding.
"""
from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional

import jax
import numpy as np

from ..data import DataLoader
from ..data.batch import bounded_batches, cycled_batches, prefetch_iterator
from ..metrics.multimodal import ade, fde, mpjpe
from ..parallel import replicate, shard_batch
from ..train.checkpoint import CheckpointManager, load_host_state, save_host_state
from ..train.trainer_autoencoder import AutoEncoderTrainer
from ..utils import MetricsLogger, flatten_config, load_config, save_config, set_seed
from ..utils.reproducibility import epoch_key, iteration_key
from .common import (
    build_autoencoder,
    build_dataset,
    build_skeleton,
    make_eval_preprocess,
    make_train_preprocess,
    setup_mesh,
)


def train(cfg: Dict) -> str:
    """Returns the experiment output path."""
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

    model = build_autoencoder(cfg, skeleton)
    trainer = AutoEncoderTrainer(
        model=model,
        lr=cfg["lr"],
        iter_per_epoch=iter_per_epoch,
        prediction_horizon_train=cfg["prediction_horizon_train"],
        prediction_horizon_eval=cfg["prediction_horizon_eval"],
        curriculum_it=cfg.get("curriculum_it", 0),
        use_lr_scheduler=cfg.get("use_lr_scheduler", False),
        lr_scheduler_kwargs=cfg.get("lr_scheduler_kwargs"),
        prediction_horizon_train_min=cfg.get("prediction_horizon_train_min", 10),
        prediction_horizon_train_min_from_epoch=cfg.get("prediction_horizon_train_min_from_epoch", 200),
        random_prediction_horizon=cfg.get("random_prediction_horizon", True),
        loss_pose_type=cfg.get("loss_pose_type", "l1"),
        seed=cfg["seed"],
    )

    # init from one example batch
    try:
        ex = next(iter(loader))
    except StopIteration:
        raise ValueError(
            f"train loader yields zero batches: {len(dataset)} segments < "
            f"batch_size {cfg['batch_size']} with drop_last — reduce "
            "model.batch_size or enlarge the dataset"
        ) from None
    k0 = jax.random.fold_in(root_key, 2**31)
    ex_obs, ex_pred, _ = preprocess(k0, ex["obs"], ex["pred"])
    state = trainer.init(jax.random.fold_in(root_key, 0), ex_obs, ex_pred)
    if mesh is not None:
        state = replicate(mesh, state)

    ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"), n_saved=20)
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
        # bit-faithful resume: restore every host RNG stream (loader shuffle,
        # dataset augmentation jitter, curriculum randint) so a resumed run
        # reproduces the uninterrupted one exactly (reference
        # `src/utils/reproducibility.py:47-79`, `train_diffusion.py:105-108`)
        if "loader" in host:
            loader.load_state_dict(host["loader"])
        if "dataset" in host:
            dataset.load_state_dict(host["dataset"])
        if "curriculum" in host:
            trainer.curriculum.load_state_dict(host["curriculum"])

    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    print(f"AutoEncoder parameters: {n_params:,}")

    it_global = resumed_step if resumed_step is not None else (
        (start_epoch - 1) * iter_per_epoch
    )
    eval_datasets = {}  # built once, reused every validation epoch
    for epoch in range(start_epoch, cfg["num_epochs"] + 1):
        trainer.epoch_started(epoch)
        ek = epoch_key(root_key, epoch)
        losses = []
        # bound the iterable BEFORE prefetching: breaking out of the
        # prefetch generator would leave the producer thread drawing extra
        # dataset-augmentation RNG (nondeterministic resume state) and
        # holding device buffers
        # ignite epoch_length parity: an epoch is EXACTLY iter_per_epoch
        # iterations, cycling the loader when one pass is shorter
        bounded = cycled_batches(loader, iter_per_epoch)
        for it, batch in enumerate(prefetch_iterator(bounded, to_device=True)):
            # independent keys for augmentation vs the train step: jax
            # split's prefix property makes reusing one key couple the two
            # streams bit-exactly (split(k,2)[i] == split(k,6)[i])
            k_pre, k_step = jax.random.split(iteration_key(ek, it))
            obs_t, pred_t, _ = preprocess(k_pre, batch["obs"], batch["pred"])
            if mesh is not None:
                obs_t, pred_t = shard_batch(mesh, obs_t), shard_batch(mesh, pred_t)
            state, loss, ph = trainer.train_step(
                state, k_step, (obs_t, pred_t), epoch=epoch, iteration=it_global
            )
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
                    "ph": ph, "epoch": epoch,
                }, prefix="train_iter")
            logger.log_param_norms(it_global, state.params,
                                   grad_norm=trainer.last_grad_norm)
            it_global += 1
        logger.log(epoch, {"loss": float(np.mean(jax.device_get(losses))),
                           "lr": trainer.lr_scheduler._current if trainer.lr_scheduler else cfg["lr"],
                           "ph": ph})
        # per-epoch weight histograms/norms (reference `tensorboard.py:98-122`)
        logger.log_param_histograms(epoch, state.params)

        # reference runs BOTH eval engines every `eval_frequency` epochs:
        # the valid split and a capped pass over the train split
        # (`train_autoencoder.py:108-113`, `src/train_utils.py:56-96`)
        score = None
        if cfg.get("if_run_validation") and epoch % cfg.get(
            "eval_frequency", cfg.get("save_frequency", 50)
        ) == 0:
            score = -validate(cfg, skeleton, trainer, state, logger, epoch,
                              dataset_cache=eval_datasets)
            validate(
                cfg, skeleton, trainer, state, logger, epoch,
                split="train", loader_key="data_loader_train_eval",
                max_batches=cfg.get("num_iteration_eval") or None,
                prefix="train_eval", dataset_cache=eval_datasets,
            )
        if score is not None or epoch % cfg.get("save_frequency", 50) == 0 or epoch == cfg["num_epochs"]:
            ckpt.save(state, step=epoch, score=score)
        ckpt.save_latest(state, step=epoch)
        host = {
            "epoch": epoch,
            "global_step": it_global,
            "loader": loader.state_dict(),
            "dataset": dataset.state_dict(),
            "curriculum": trainer.curriculum.state_dict(),
        }
        if trainer.lr_scheduler is not None:
            host["lr_scheduler"] = trainer.lr_scheduler.state_dict()
        save_host_state(out_dir, host)
    logger.close()
    return out_dir


def validate(cfg, skeleton, trainer, state, logger, epoch, split="valid",
             loader_key="data_loader_valid", max_batches=None, prefix="valid",
             dataset_cache=None) -> float:
    """ADE/FDE/MPJPE on a split (metric space, S=1); reference
    `src/train_utils.py:56-96` (same engine attached to the valid split and,
    capped at ``num_iteration_eval`` batches, to the train split).
    ``dataset_cache``: per-run dict so the eval datasets (full npz re-read +
    segment generation) are built once, not on every validation epoch."""
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
    vals = {"ADE": [], "FDE": [], "MPJPE": []}
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        obs_t, pred_t, _ = preprocess(jax.random.key(0), batch["obs"], batch["pred"])
        pred, y, x, z = trainer.validation_step(state, (obs_t, pred_t))
        pred_m = skeleton.transform_to_metric_space(pred)[:, None]
        y_m = skeleton.transform_to_metric_space(y)
        vals["ADE"].append(np.asarray(ade(y_m, pred_m)))
        vals["FDE"].append(np.asarray(fde(y_m, pred_m)))
        vals["MPJPE"].append(np.asarray(mpjpe(y_m, pred_m)))
    results = {k: float(np.concatenate(v).mean()) for k, v in vals.items()}
    logger.log(epoch, results, prefix=prefix)
    print(f"[epoch {epoch}] {prefix}:", results)
    return results["MPJPE"]


def main(argv: Optional[List[str]] = None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = os.environ.get("SKELDIFF_CONFIG_DIR", "configs/config_train_autoencoder")
    cfg = flatten_config(load_config(config_dir, argv))
    return train(cfg)


if __name__ == "__main__":
    main()
