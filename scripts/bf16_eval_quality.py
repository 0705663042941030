#!/usr/bin/env python
"""bf16-vs-fp32 comparison at the METRIC-TABLE level (VERDICT r2 #4).

Two questions the step-loss study (``scripts/bf16_quality.py``) cannot
answer:

1. **Eval dtype sensitivity** — the eval tree defaults
   ``compute_dtype: bfloat16`` (``configs/config_eval/config.yaml``), which
   overrides the stored train config.  How far does the FULL probabilistic
   metric table move vs a strict-fp32 eval of the SAME checkpoint?
2. **Training dtype sensitivity** — train the full flagship architecture
   (latent 96, depth-4 denoiser, T=10, k=50 input-space argmin) twice from
   identical seeds, fp32 vs bf16 network compute, then eval BOTH in fp32:
   how far apart do the final metric tables land?

Both run end-to-end through the real CLIs (two-stage training + eval) on a
synthetic AMASS-format dataset at FULL task shapes (fps 60, obs 30,
pred 120), so every seam of the shipped pipeline is the one measured.
Writes ``docs/bf16_eval_quality.json`` (cited by the eval CLI's
compute_dtype notice).

    python scripts/bf16_eval_quality.py --out docs/bf16_eval_quality.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

J = 22
CLIP_LEN = 400  # >= obs 30 + pred 120


def make_dataset(root: str) -> None:
    """Synthetic AMASS-format data at full task shapes via the packaged
    generator.  Threshold 2.0 keeps neighbor sets sparse on unit-noise poses
    (see scripts/eval_loop_bench.py)."""
    from skeletondiffusion_tpu.data.synthetic import make_synthetic_amass

    make_synthetic_amass(
        root,
        obs_length=30, pred_length=120,
        test_datasets=("DFaust",), files_per_dataset=2,
        clip_len=CLIP_LEN, segment_stride=40,
        multimodal_threshold=2.0, num_joints=J, pose_box_size=1.5, seed=0,
    )


def train_two_stage(root: str, label: str, compute_dtype: str):
    """Full flagship-arch two-stage training, tiny duration.  Returns the
    stage-2 experiment dir."""
    from skeletondiffusion_tpu.cli.train_autoencoder import main as train_ae_main
    from skeletondiffusion_tpu.cli.train_diffusion import main as train_diff_main

    common = [
        f"dataset_main_path={root}/datasets",
        "device_mesh.n_devices=1",
        f"model.compute_dtype={compute_dtype}",
        "dataset.data_loader_train.datasets=[ACCAD, CMU]",
        "dataset.data_loader_train.stride=20",
        "dataset.data_loader_train.augmentation=10",
    ]
    ae_dir = train_ae_main(common + [
        "dataset=amass",
        f"output_log_path={root}/out_ae_{label}",
        "model.num_epochs=2",
        "model.batch_size=16",
        "model.num_iter_perepoch=8",
        "model.save_frequency=1",
        "model.if_run_validation=False",
    ])
    diff_dir = train_diff_main(common + [
        f"output_log_path={root}/out_diff_{label}",
        f"model.pretrained_autoencoder_path={ae_dir}/checkpoints",
        "model.num_epochs=2",
        "model.batch_size=16",
        "model.num_iter_perepoch=8",
        "model.save_frequency=1",
        # EMA active from step 0 so the 16-step run's eval weights are real
        "model.step_start_ema=0",
    ])
    return diff_dir


def run_eval(root: str, diff_dir: str, compute_dtype: str, tag: str):
    from skeletondiffusion_tpu.cli.eval import main as eval_main

    return eval_main([
        "dataset=amass",
        f"dataset_main_path={root}/datasets",
        "device_mesh.n_devices=1",
        f"checkpoint_path={diff_dir}",
        f"compute_dtype={compute_dtype}",
        "stats_mode=probabilistic",
        "batch_size=20",
        "num_samples=50",
        "seed=0",
        "if_compute_cmd=True",
        "if_compute_apde=True",
        f"results_path={root}/results_{tag}.yaml",
    ])


def delta_table(a, b):
    keys = sorted(set(a) & set(b))
    out = {}
    for k in keys:
        d = float(b[k]) - float(a[k])
        out[k] = {
            "abs_delta": round(d, 8),
            "rel_delta": round(d / max(abs(float(a[k])), 1e-12), 6),
        }
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "bf16_eval_quality.json"))
    ap.add_argument("--root", default=None, help="work dir (default: temp)")
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="bf16_eval_")
    os.makedirs(root, exist_ok=True)
    os.chdir(REPO)
    make_dataset(root)

    print("== training fp32 (two-stage, flagship arch) ==", flush=True)
    dir_fp32 = train_two_stage(root, "fp32", "null")
    print("== training bf16 (two-stage, flagship arch) ==", flush=True)
    dir_bf16 = train_two_stage(root, "bf16", "bfloat16")

    print("== eval: fp32 checkpoint, fp32 compute ==", flush=True)
    e_fp32 = run_eval(root, dir_fp32, "null", "ckptfp32_evalfp32")
    print("== eval: fp32 checkpoint, bf16 compute ==", flush=True)
    e_bf16 = run_eval(root, dir_fp32, "bfloat16", "ckptfp32_evalbf16")
    print("== eval: bf16-trained checkpoint, fp32 compute ==", flush=True)
    e_trained_bf16 = run_eval(root, dir_bf16, "null", "ckptbf16_evalfp32")

    eval_deltas = delta_table(e_fp32, e_bf16)
    train_deltas = delta_table(e_fp32, e_trained_bf16)
    report = {
        "setup": {
            "arch": "flagship (latent 96, hidden 96, depth-4 denoiser, T=10, k=50)",
            "shapes": {"obs": 30, "pred": 120, "joints": J, "num_samples": 50},
            "train_steps_per_stage": 16,
            "eval": "probabilistic suite + CMD + APDE, synthetic AMASS test split",
            "note": "eval_dtype_sensitivity: SAME fp32 checkpoint evaluated "
                    "fp32 vs bf16 compute. train_dtype_sensitivity: fp32- vs "
                    "bf16-trained runs (identical seeds), both eval'd fp32.",
        },
        "metrics_fp32": {k: float(v) for k, v in sorted(e_fp32.items())},
        "metrics_eval_bf16": {k: float(v) for k, v in sorted(e_bf16.items())},
        "metrics_trained_bf16": {k: float(v) for k, v in sorted(e_trained_bf16.items())},
        "eval_dtype_sensitivity": eval_deltas,
        "train_dtype_sensitivity": train_deltas,
        "eval_dtype_max_abs_delta": max(
            (abs(v["abs_delta"]) for v in eval_deltas.values()), default=0.0),
        "train_dtype_max_abs_delta": max(
            (abs(v["abs_delta"]) for v in train_deltas.values()), default=0.0),
    }
    print(json.dumps(report, indent=2))
    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
