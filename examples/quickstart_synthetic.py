#!/usr/bin/env python
"""Quickstart: the WHOLE pipeline end-to-end on synthetic data — no AMASS
download, runs on CPU in a few minutes (first run pays XLA compiles; set
JAX_COMPILATION_CACHE_DIR to make re-runs fast).

    python examples/quickstart_synthetic.py --out /tmp/skeldiff_quickstart

Generates a tiny AMASS-format dataset, trains stage 1 (autoencoder) and
stage 2 (latent diffusion), evaluates the probabilistic metric suite, and
exports a serving artifact — the same flow as the real recipes in
README.md/MIGRATION.md, just at smoke scale (0.1 s history / 0.25 s horizon).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/skeldiff_quickstart")
    args = p.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff")

    from skeletondiffusion_tpu.cli.eval import main as eval_main
    from skeletondiffusion_tpu.cli.train_autoencoder import main as train_ae_main
    from skeletondiffusion_tpu.cli.train_diffusion import main as train_diff_main
    from skeletondiffusion_tpu.data.synthetic import make_synthetic_amass

    ds_root = make_synthetic_amass(args.out)
    print(f"[1/5] synthetic dataset at {ds_root}")

    task = ["task.history_sec=0.1", "task.prediction_horizon_sec=0.25"]
    data = [f"dataset_main_path={ds_root}",
            "dataset.data_loader_train.datasets=[ACCAD, CMU]",
            "dataset.data_loader_train.stride=4"]
    ae_dir = train_ae_main(data + task + [
        f"output_log_path={args.out}/ae",
        "model.num_epochs=2", "model.batch_size=8", "model.num_iter_perepoch=3",
        "model.latent_size=16", "model.autoenc_arch.encoder_hidden_size=16",
        "model.autoenc_arch.decoder_hidden_size=16", "model.save_frequency=2",
    ])
    print(f"[2/5] autoencoder trained -> {ae_dir}")

    diff_dir = train_diff_main(data + [
        f"output_log_path={args.out}/diff",
        f"model.pretrained_autoencoder_path={ae_dir}/checkpoints",
        "model.num_epochs=1", "model.batch_size=8", "model.num_iter_perepoch=3",
        "model.train_pick_best_sample_among_k=3", "model.diffusion_timesteps=4",
        "model.diffusion_arch.depth=1", "model.diffusion_arch.attn_heads=2",
        "model.diffusion_arch.attn_dim_head=4",
    ])
    print(f"[3/5] diffusion trained -> {diff_dir}")

    results = eval_main([
        f"dataset_main_path={ds_root}", "dataset=amass",
        f"checkpoint_path={diff_dir}", "stats_mode=probabilistic",
        "batch_size=56", "num_samples=4", *task,
        f"results_path={args.out}/results.yaml",
    ])
    print(f"[4/5] eval done: ADE={results['ADE']:.4f} APD={results['APD']:.4f}")

    import jax

    from skeletondiffusion_tpu.inference import InferenceSession
    from skeletondiffusion_tpu.serving import ServingModel, export_predictor

    session = InferenceSession(diff_dir, "amass", num_samples=4, overrides=task)
    artifact = os.path.join(args.out, "artifact")
    export_predictor(session.predictor, artifact, batch_size=2)
    model = ServingModel(artifact)
    import numpy as np

    obs = np.random.default_rng(0).standard_normal(
        (2, session.skeleton.obs_length, session.skeleton.num_nodes, 3)
    ).astype(np.float32) * 0.2
    pred = model(jax.random.key(0), obs)
    print(f"[5/5] serving artifact at {artifact}; served {pred.shape}")


if __name__ == "__main__":
    main()
