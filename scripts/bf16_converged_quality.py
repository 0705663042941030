#!/usr/bin/env python
"""bf16-vs-fp32 metric deltas measured on a CONVERGED model (VERDICT r3 #2).

The round-3 study (``scripts/bf16_eval_quality.py``) measured metric-table
deltas on 16-step near-init models — rounding sensitivity there need not
transfer to a trained model whose metrics sit near their floors.  This
script re-measures both questions on the convergence capstone's genuinely
good flagship model (``scripts/convergence_capstone.py``; docs/convergence.json):

1. **Eval dtype** — the capstone's (bf16-trained, flagship) k50_motion
   checkpoint evaluated with ``compute_dtype=null`` vs ``bfloat16``: full
   probabilistic table deltas.
2. **Train dtype** — retrain stage 2 (same frozen AE, same seed, same
   schedule) with ``compute_dtype=null``, evaluate BOTH checkpoints in fp32,
   diff the tables.

Appends a ``converged`` section to ``docs/bf16_eval_quality.json``.
Requires a completed capstone run (default root /tmp/capstone).

    python scripts/convergence_capstone.py          # first (hours)
    python scripts/bf16_converged_quality.py        # then this (~30 min)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

POSITION_METRICS = ("ADE", "FDE", "MMADE", "MMFDE")  # metres


def delta_table(a, b):
    keys = sorted(set(a) & set(b))
    return {
        k: {
            "abs_delta": round(float(b[k]) - float(a[k]), 8),
            "rel_delta": round((float(b[k]) - float(a[k])) / max(abs(float(a[k])), 1e-12), 6),
        }
        for k in keys
    }


def run_eval(root, diff_dir, compute_dtype, tag):
    from skeletondiffusion_tpu.cli.eval import main as eval_main

    res_path = os.path.join(root, "evals", f"results_bf16study_{tag}.yaml")
    if not os.path.exists(res_path):
        eval_main([
            "dataset=amass",
            f"dataset_main_path={root}/datasets",
            "dataset.data_loader_test.datasets=[DFaust, GRAB]",
            "device_mesh.n_devices=1",
            "task.history_sec=0.5", "task.prediction_horizon_sec=2.0",
            f"checkpoint_path={diff_dir}",
            f"compute_dtype={compute_dtype}",
            "stats_mode=probabilistic", "batch_size=256", "num_samples=50",
            "seed=0", "if_compute_cmd=True", "if_compute_apde=True",
            f"results_path={res_path}",
        ])
    import yaml

    with open(res_path) as f:
        return yaml.safe_load(f)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/capstone")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "bf16_eval_quality.json"))
    ap.add_argument("--eval-only", action="store_true",
                    help="measure only the (cheap) eval-dtype sensitivity on the "
                         "capstone checkpoint; skip the fp32-trained twin")
    args = ap.parse_args()
    root = args.root
    os.chdir(REPO)

    bf16_dir = os.path.join(root, "out_diff_k50_motion")
    ae_dir = os.path.join(root, "out_ae")
    assert os.path.exists(os.path.join(bf16_dir, "CAPSTONE_DONE")), (
        "run scripts/convergence_capstone.py to completion first"
    )

    # fp32-trained twin of the flagship stage-2 run (same AE, seed, schedule)
    fp32_dir = os.path.join(root, "out_diff_k50_motion_fp32")
    if not args.eval_only and not os.path.exists(os.path.join(fp32_dir, "DONE")):
        from skeletondiffusion_tpu.cli.train_diffusion import main as diff_main

        with open(os.path.join(bf16_dir, "config.yaml")) as f:
            import yaml

            bf16_cfg = yaml.safe_load(f)
        # mirror the capstone flagship's exact schedule (epochs, per-epoch
        # iteration cap, LR warmup/decay) so the ONLY difference is dtype
        diff_epochs = bf16_cfg["num_epochs"]
        sched = bf16_cfg["lr_scheduler_kwargs"]
        iters = bf16_cfg.get("num_iter_perepoch")
        print(f"== training fp32 twin ({diff_epochs} epochs) ==", flush=True)
        # within-phase resume after a tunnel flake (same pattern as the
        # capstone's resume_flag): the trainers' resume is bit-faithful
        ckpts = os.path.join(fp32_dir, "checkpoints")
        resume = (["model.if_resume_training=True"]
                  if os.path.isdir(ckpts)
                  and any(d.startswith("latest_") for d in os.listdir(ckpts)) else [])
        diff_main(resume + [
            f"dataset_main_path={root}/datasets",
            "device_mesh.n_devices=1",
            "task.history_sec=0.5", "task.prediction_horizon_sec=2.0",
            f"output_log_path={fp32_dir}",
            f"model.pretrained_autoencoder_path={ae_dir}/checkpoints",
            "model.compute_dtype=null",
            f"model.num_epochs={diff_epochs}",
            f"model.num_iter_perepoch={iters if iters else 'null'}",
            "model.batch_size=64",
            "model.train_pick_best_sample_among_k=50",
            "model.similarity_space=input_space",
            "model.if_run_validation=True", "model.eval_frequency=10",
            f"model.lr_scheduler_kwargs.warmup_duration={sched['warmup_duration']}",
            f"model.lr_scheduler_kwargs.update_every={sched['update_every']}",
            f"model.lr_scheduler_kwargs.gamma_decay={sched['gamma_decay']}",
        ])
        with open(os.path.join(fp32_dir, "DONE"), "w") as f:
            f.write("ok")

    print("== eval: bf16-trained ckpt, fp32 compute ==", flush=True)
    e_ckptbf16_fp32 = run_eval(root, bf16_dir, "null", "ckptbf16_evalfp32")
    print("== eval: bf16-trained ckpt, bf16 compute ==", flush=True)
    e_ckptbf16_bf16 = run_eval(root, bf16_dir, "bfloat16", "ckptbf16_evalbf16")
    if args.eval_only:
        e_ckptfp32_fp32, train_deltas = None, None
    else:
        print("== eval: fp32-trained ckpt, fp32 compute ==", flush=True)
        e_ckptfp32_fp32 = run_eval(root, fp32_dir, "null", "ckptfp32_evalfp32")
        train_deltas = delta_table(e_ckptfp32_fp32, e_ckptbf16_fp32)

    eval_deltas = delta_table(e_ckptbf16_fp32, e_ckptbf16_bf16)
    converged = {
        "setup": {
            "model": "convergence-capstone flagship k50_motion "
                     "(docs/convergence.json; beats ZeroVelocity, LR at floor)",
            "eval_dtype": "SAME bf16-trained checkpoint eval'd fp32 vs bf16 compute",
            "train_dtype": "fp32- vs bf16-trained stage-2 twins (same frozen AE, "
                           "seed, schedule), both eval'd fp32",
        },
        "metrics_ckptbf16_evalfp32": {k: float(v) for k, v in sorted(e_ckptbf16_fp32.items())},
        "metrics_ckptbf16_evalbf16": {k: float(v) for k, v in sorted(e_ckptbf16_bf16.items())},
        "eval_dtype_sensitivity": eval_deltas,
        "eval_dtype_max_abs_delta_position_m": max(
            abs(eval_deltas[k]["abs_delta"]) for k in POSITION_METRICS if k in eval_deltas),
    }
    if not args.eval_only:
        converged["metrics_ckptfp32_evalfp32"] = {
            k: float(v) for k, v in sorted(e_ckptfp32_fp32.items())}
        converged["train_dtype_sensitivity"] = train_deltas
        converged["train_dtype_max_abs_delta_position_m"] = max(
            abs(train_deltas[k]["abs_delta"]) for k in POSITION_METRICS if k in train_deltas)
    with open(args.out) as f:
        report = json.load(f)
    # --eval-only must not clobber an earlier full run's train-dtype section
    prior = report.get("converged", {})
    if args.eval_only and "train_dtype_sensitivity" in prior:
        for k in ("metrics_ckptfp32_evalfp32", "train_dtype_sensitivity",
                  "train_dtype_max_abs_delta_position_m"):
            converged[k] = prior[k]
    report["converged"] = converged
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(converged["eval_dtype_sensitivity"], indent=2))
    if "train_dtype_sensitivity" in converged:
        print(json.dumps(converged["train_dtype_sensitivity"], indent=2))
    print("position-metric max |delta| (m): eval-dtype",
          converged["eval_dtype_max_abs_delta_position_m"],
          "train-dtype",
          converged.get("train_dtype_max_abs_delta_position_m", "SKIPPED (--eval-only)"))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
