"""Bit-faithful resume: training N epochs straight must equal training
N/2 epochs, restarting the process state, and training the rest (VERDICT r1
weak #5; the reference checkpoints full RNG state,
`src/utils/reproducibility.py:47-79`, `train_diffusion.py:105-108`)."""
import json
import os

import numpy as np
import pytest
from conftest import REPO_ROOT

J = 22


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    pre = root / "datasets" / "processed" / "AMASS" / "hmp"
    pre.mkdir(parents=True)
    rng = np.random.default_rng(3)
    positions = {
        ds: {fi: rng.standard_normal((70, J, 3)).astype(np.float32) * 0.3 for fi in range(2)}
        for ds in ("ACCAD", "CMU")
    }
    np.savez(pre / "data_3d_amass.npz", positions_3d=positions)
    return str(root)


def _ae_args(data_root, out, epochs, resume=False):
    args = [
        f"dataset_main_path={data_root}/datasets",
        "task.history_sec=0.1",
        "task.prediction_horizon_sec=0.2",
        "device_mesh.n_devices=1",
        "dataset=amass",
        f"output_log_path={out}",
        f"model.num_epochs={epochs}",
        "model.batch_size=4",
        "model.num_iter_perepoch=2",
        "model.latent_size=8",
        "model.autoenc_arch.encoder_hidden_size=8",
        "model.autoenc_arch.decoder_hidden_size=8",
        "model.curriculum_it=3",          # curriculum rng active across the split
        "model.save_frequency=1",
        "model.use_lr_scheduler=True",
        "dataset.data_loader_train.datasets=[ACCAD, CMU]",
        "dataset.data_loader_train.stride=4",
        "dataset.data_loader_train.augmentation=2",  # dataset rng active
        "dataset.data_loader_train.shuffle=True",    # loader rng active
    ]
    if resume:
        args += ["model.if_resume_training=True"]
    return args


def _params_vec(exp_dir):
    import jax

    from skeletondiffusion_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
    raw = ckpt.restore_raw()
    leaves = jax.tree.leaves(raw["params"])
    return np.concatenate([np.asarray(l).ravel() for l in leaves])


def _loss_trace(exp_dir):
    out = []
    with open(os.path.join(exp_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == "train":
                out.append((rec["step"], rec["loss"]))
    return out


def test_resume_reproduces_uninterrupted_run(data_root, monkeypatch):
    from skeletondiffusion_tpu.cli.train_autoencoder import main as train_ae_main

    monkeypatch.chdir(REPO_ROOT)
    straight = os.path.join(data_root, "straight")
    train_ae_main(_ae_args(data_root, straight, epochs=4))

    split = os.path.join(data_root, "split")
    train_ae_main(_ae_args(data_root, split, epochs=2))
    train_ae_main(_ae_args(data_root, split, epochs=4, resume=True))

    # identical final params
    p_straight = _params_vec(straight)
    p_split = _params_vec(split)
    np.testing.assert_array_equal(p_straight, p_split)

    # identical per-epoch loss trace for the resumed epochs (3, 4)
    straight_losses = dict(_loss_trace(straight))
    split_losses = dict(_loss_trace(split))
    for ep in (3, 4):
        assert straight_losses[ep] == split_losses[ep], (
            ep, straight_losses[ep], split_losses[ep])

    # host_state carries every RNG stream + global step
    with open(os.path.join(split, "host_state.json")) as f:
        host = json.load(f)
    for key in ("loader", "dataset", "curriculum", "global_step", "lr_scheduler"):
        assert key in host, key


def _diff_args(data_root, ae_dir, out, epochs, resume=False):
    args = [
        f"dataset_main_path={data_root}/datasets",
        "task.history_sec=0.1",
        "task.prediction_horizon_sec=0.2",
        "device_mesh.n_devices=1",
        f"output_log_path={out}",
        f"model.pretrained_autoencoder_path={ae_dir}/checkpoints",
        f"model.num_epochs={epochs}",
        "model.batch_size=4",
        "model.num_iter_perepoch=2",
        "model.train_pick_best_sample_among_k=2",
        "model.diffusion_timesteps=3",
        "model.diffusion_arch.depth=1",
        "model.diffusion_arch.attn_heads=2",
        "model.diffusion_arch.attn_dim_head=4",
        "dataset.data_loader_train.datasets=[ACCAD, CMU]",
        "dataset.data_loader_train.stride=4",
        "dataset.data_loader_train.augmentation=2",
        "dataset.data_loader_train.shuffle=True",
    ]
    if resume:
        args += ["model.if_resume_training=True"]
    return args


def test_diffusion_resume_reproduces_uninterrupted_run(data_root, monkeypatch):
    """Stage-2 resume parity (review finding: the diffusion CLI saved only
    {epoch, lr_scheduler}, so the loader/dataset RNG restore was dead)."""
    from skeletondiffusion_tpu.cli.train_autoencoder import main as train_ae_main
    from skeletondiffusion_tpu.cli.train_diffusion import main as train_diff_main

    monkeypatch.chdir(REPO_ROOT)
    ae_dir = os.path.join(data_root, "ae_for_diff")
    train_ae_main(_ae_args(data_root, ae_dir, epochs=1))

    straight = os.path.join(data_root, "diff_straight")
    train_diff_main(_diff_args(data_root, ae_dir, straight, epochs=4))

    split = os.path.join(data_root, "diff_split")
    train_diff_main(_diff_args(data_root, ae_dir, split, epochs=2))
    train_diff_main(_diff_args(data_root, ae_dir, split, epochs=4, resume=True))

    np.testing.assert_array_equal(_params_vec(straight), _params_vec(split))
    straight_losses = dict(_loss_trace(straight))
    split_losses = dict(_loss_trace(split))
    for ep in (3, 4):
        assert straight_losses[ep] == split_losses[ep], (
            ep, straight_losses[ep], split_losses[ep])
    with open(os.path.join(split, "host_state.json")) as f:
        host = json.load(f)
    for key in ("loader", "dataset", "global_step"):
        assert key in host, key
