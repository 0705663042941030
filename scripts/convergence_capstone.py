"""Convergence capstone: train the full two-stage flagship to a genuinely
good model on synthetic motion data (VERDICT r3 next-round #1).

Every prior training-side proof was short-horizon (<=150 steps).  This
script runs the real CLIs end-to-end on the procedural rigid-skeleton
motion dataset (`skeletondiffusion_tpu.data.synthetic.
make_synthetic_amass_motion`) at full task shapes (obs 30 / pred 120 @
60 fps) long enough that:

  (a) the flagship (k=50 motion-argmin) beats the ZeroVelocity baseline's
      min-ADE/FDE by a wide margin on the same test split,
  (b) APD(k=50 motion-argmin) > APD(k=50 latent-argmin) > APD(k=1) — the
      direction of the reference's ablation (`/root/reference/README.md:
      279-294`),
  (c) EMA validation ADE improves across epochs with top-k checkpoint
      rotation exercised on real validation scores,
  (d) the LR scheduler reaches its min-lr floor and the prediction-horizon
      curriculum fully anneals (reference `src/core/trainer.py:37-53`,
      `src/core/utils/scheduler.py:5-50`).

Output: ``docs/convergence.json`` with the full evidence trail.  Resumable:
each phase writes a completion marker and is skipped when already done.

Run (real TPU, ~1-2 h):   python scripts/convergence_capstone.py
Smoke (CPU, minutes):     python scripts/convergence_capstone.py --smoke
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def marker(path: str) -> str:
    return os.path.join(path, "CAPSTONE_DONE")


def done(path: str) -> bool:
    return os.path.exists(marker(path))


def mark(path: str):
    with open(marker(path), "w") as f:
        f.write(time.strftime("%Y-%m-%dT%H:%M:%S"))


def read_jsonl(path: str):
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def resume_flag(out_dir: str) -> list:
    """Within-phase resume: if a prior (interrupted) run of this phase left
    checkpoints behind, restart the trainer from its latest epoch instead of
    from scratch.  The trainers' resume is bit-faithful (host RNG streams,
    LR-scheduler state, step counters all checkpointed), so a supervised
    restart after a tunnel flake loses at most one epoch."""
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    if os.path.isdir(ckpt_dir) and any(d.startswith("latest_") for d in os.listdir(ckpt_dir)):
        return ["model.if_resume_training=True"]
    return []


def run_phase(name: str, out_dir: str, fn, timings: dict):
    if done(out_dir):
        print(f"[capstone] {name}: already done, skipping")
        return
    print(f"[capstone] {name}: starting")
    t0 = time.time()
    fn()
    timings[name] = round(time.time() - t0, 1)
    mark(out_dir)
    print(f"[capstone] {name}: done in {timings[name]} s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/capstone")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes/epochs on CPU to exercise the plumbing")
    ap.add_argument("--only-done-variants", action="store_true",
                    help="do not train stage-2 variants whose phase marker is "
                         "absent; evaluate + report only completed ones (an "
                         "honestly-partial convergence.json when the TPU "
                         "budget runs out mid-schedule)")
    ap.add_argument("--out-json", default=os.path.join(REPO, "docs", "convergence.json"))
    # Session-fit schedule knobs: the default (ideal) schedule needs ~3 h of
    # single-chip TPU; a builder session has ~1 h.  These override epochs /
    # iters-per-epoch / LR decay so the SAME checks (LR floor reached,
    # curriculum annealed, EMA val improvement, top-k rotation, APD ordering,
    # beats-zero-velocity) are exercised inside a bounded budget.  All values
    # land in the report's `config` block, so the evidence is self-describing.
    ap.add_argument("--ae-epochs", type=int, default=None)
    ap.add_argument("--ae-iters", type=int, default=None,
                    help="stage-1 num_iter_perepoch (default: full epochs)")
    ap.add_argument("--ae-gamma", type=float, default=None,
                    help="stage-1 LR gamma_decay (config default 0.98)")
    ap.add_argument("--diff-epochs", type=int, default=None)
    ap.add_argument("--diff-iters", type=int, default=None)
    ap.add_argument("--diff-gamma", type=float, default=None)
    ap.add_argument("--diff-warmup", type=int, default=None)
    ap.add_argument("--eval-freq", type=int, default=None)
    ap.add_argument("--data-only", action="store_true",
                    help="build the synthetic dataset on the LOCAL CPU backend "
                         "and exit.  Data prep is host-side jax (skeleton "
                         "transforms); on a tunneled remote TPU every dispatch "
                         "pays the tunnel round-trip, so run this phase in a "
                         "CPU subprocess first — the training run then skips "
                         "it via the phase marker.")
    args = ap.parse_args()

    if args.smoke or args.data_only:
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff")
    os.chdir(REPO)  # configs/ tree resolution

    root = args.root
    os.makedirs(root, exist_ok=True)
    timings: dict = {}
    t_all = time.time()

    # ---- shapes / schedule ---------------------------------------------
    if args.smoke:
        task = ["task.history_sec=0.1", "task.prediction_horizon_sec=0.25"]
        obs_len, pred_len = 6, 15
        clip_len, files_per_ds, stride = 90, 4, 9
        ae_epochs, ae_warm, diff_epochs, diff_warm = 6, 2, 6, 2
        eval_freq, curriculum_it = 2, 2
        arch = ["model.latent_size=16",
                "model.autoenc_arch.encoder_hidden_size=16",
                "model.autoenc_arch.decoder_hidden_size=16"]
        diff_arch = ["model.diffusion_arch.depth=1",
                     "model.diffusion_arch.attn_heads=2",
                     "model.diffusion_arch.attn_dim_head=4",
                     "model.diffusion_timesteps=4"]
        k_full = 4
        num_samples = 4
        diff_sched = ["model.num_iter_perepoch=null"]
    else:
        task = ["task.history_sec=0.5", "task.prediction_horizon_sec=2.0"]
        obs_len, pred_len = 30, 120
        clip_len, files_per_ds, stride = 480, 25, 15
        # LR floors: AE 5e-3 ->(x0.98/epoch after 10 warmup)-> 1e-4 at epoch
        # ~204; diffusion 1e-3 ->(x0.94/epoch after 10 warmup)-> 1e-4 at
        # epoch ~48 < 60.  The faster diffusion decay + 256-iteration epochs
        # keep the three stage-2 variants + the bf16 fp32 twin inside the
        # round's TPU budget (measured 0.12-0.18 s/step) while still
        # exercising the floor's sticky branch for >10 epochs.
        ae_epochs, ae_warm, diff_epochs, diff_warm = 210, 10, 60, 10
        eval_freq, curriculum_it = 10, 20
        arch = []           # flagship: latent 96, hidden 96
        diff_arch = []      # flagship: depth 4, heads 8, T=10
        k_full = 50
        num_samples = 50
        diff_sched = ["model.num_iter_perepoch=256",
                      "model.lr_scheduler_kwargs.gamma_decay=0.94"]

    # stage-2 epoch accounting stays meaningful with num_iter_perepoch=256:
    # 60 epochs x 256 iters x batch 64 ~ 1.0M samples over 33k train segments

    # ---- session-fit overrides (see the argparse help above) ---------------
    if args.ae_epochs is not None:
        ae_epochs = args.ae_epochs
    if args.diff_epochs is not None:
        diff_epochs = args.diff_epochs
    if args.diff_warmup is not None:
        diff_warm = args.diff_warmup
    if args.eval_freq is not None:
        eval_freq = args.eval_freq
    ae_sched = []
    if args.ae_gamma is not None:
        ae_sched.append(f"model.lr_scheduler_kwargs.gamma_decay={args.ae_gamma}")
    ae_iters = "null" if args.ae_iters is None else str(args.ae_iters)
    if args.diff_iters is not None:
        diff_sched = [o for o in diff_sched if not o.startswith("model.num_iter_perepoch")]
        diff_sched.append(f"model.num_iter_perepoch={args.diff_iters}")
    if args.diff_gamma is not None:
        diff_sched = [o for o in diff_sched
                      if not o.startswith("model.lr_scheduler_kwargs.gamma_decay")]
        diff_sched.append(f"model.lr_scheduler_kwargs.gamma_decay={args.diff_gamma}")

    # ---- phase: dataset ---------------------------------------------------
    ds_root = os.path.join(root, "datasets")

    def build_data():
        from skeletondiffusion_tpu.data.synthetic import make_synthetic_amass_motion

        make_synthetic_amass_motion(
            root, obs_length=obs_len, pred_length=pred_len,
            files_per_dataset=files_per_ds, clip_len=clip_len,
            test_segment_stride=stride * 2, seed=7,
        )

    os.makedirs(ds_root, exist_ok=True)
    run_phase("data", ds_root, build_data, timings)
    if args.data_only:
        print("[capstone] --data-only: dataset ready, exiting")
        return

    common = [
        f"dataset_main_path={ds_root}",
        "device_mesh.n_devices=1",
        *task,
    ]
    train_data = [
        "dataset.data_loader_train.datasets=[ACCAD, CMU, BMLmovi, KIT]",
        f"dataset.data_loader_train.stride={stride}",
        f"dataset.data_loader_train.augmentation={max(stride // 2 - 1, 0)}",
        "dataset.data_loader_train_eval.datasets=[ACCAD, CMU, BMLmovi, KIT]",
        "dataset.data_loader_valid.datasets=[HumanEva]",
    ]

    # ---- evidence banking (VERDICT r4 weak #1 / ask #2) ---------------------
    # /tmp is not guaranteed across sessions and a tunnel flake has already
    # eaten one full run: after EVERY completed phase, (re)write an honestly-
    # partial docs/convergence.json so a mid-run kill still leaves committed
    # evidence of every phase that finished.  The final write at the end of
    # main() is just the last of these.
    resolved_config = dict(
        obs_len=obs_len, pred_len=pred_len, clip_len=clip_len,
        files_per_dataset=files_per_ds,
        ae_epochs=ae_epochs, ae_warmup=ae_warm,
        ae_iters_per_epoch=None if ae_iters == "null" else int(ae_iters),
        ae_gamma=args.ae_gamma if args.ae_gamma is not None else 0.98,
        ae_sched=ae_sched,
        diff_epochs=diff_epochs, diff_warmup=diff_warm, diff_sched=diff_sched,
        eval_freq=eval_freq, curriculum_it=curriculum_it,
        k=k_full, num_samples=num_samples,
    )
    results: dict = {}
    diff_dirs: dict = {}
    ae_dir = os.path.join(root, "out_ae")

    def bank(last_phase: str):
        """Write the partial report now; safe at any point after data prep."""
        report = analyze(root, ae_dir, diff_dirs, results, smoke=args.smoke,
                         timings=timings, config=resolved_config)
        report["last_phase_done"] = last_phase
        report["timings_sec"] = dict(timings, total=round(time.time() - t_all, 1))
        os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"[capstone] banked partial report after '{last_phase}' -> {args.out_json}")
        return report

    # ---- phase: stage-1 autoencoder ---------------------------------------

    def train_ae():
        from skeletondiffusion_tpu.cli.train_autoencoder import main as ae_main

        ae_main(common + train_data + arch + ae_sched + resume_flag(ae_dir) + [
            "dataset=amass",
            f"output_log_path={ae_dir}",
            f"model.num_epochs={ae_epochs}",
            f"model.num_iter_perepoch={ae_iters}",
            "model.batch_size=64",
            f"model.curriculum_it={curriculum_it}",
            "model.if_run_validation=True",
            f"model.eval_frequency={eval_freq}",
            f"model.save_frequency={eval_freq * 5}",
            f"model.lr_scheduler_kwargs.warmup_duration={ae_warm}",
            "model.lr_scheduler_kwargs.update_every=1",
        ])

    run_phase("train_autoencoder", ae_dir, train_ae, timings)
    bank("train_autoencoder")

    # ---- eval helper (used per variant, immediately after it trains) --------
    eval_dir = os.path.join(root, "evals")
    os.makedirs(eval_dir, exist_ok=True)

    def run_eval(name: str, extra: list):
        from skeletondiffusion_tpu.cli.eval import main as eval_main

        res_path = os.path.join(eval_dir, f"results_{name}.yaml")
        if not os.path.exists(res_path):
            t0 = time.time()
            eval_main(common + [
                "dataset=amass",
                "dataset.data_loader_test.datasets=[DFaust, GRAB]",
                "stats_mode=probabilistic",
                f"num_samples={num_samples}",
                "batch_size=256",
                "if_compute_cmd=True",
                "if_compute_apde=True",
                f"results_path={res_path}",
            ] + extra)
            timings[f"eval_{name}"] = round(time.time() - t0, 1)
        import yaml

        with open(res_path) as f:
            return yaml.safe_load(f)

    # the reference's algorithmic baseline runs in CenterPose space
    # (`configs/config_eval/method_specs/zerovelocity_alg_baseline.yaml`) —
    # the metric space is identical, so ADE/FDE are directly comparable.
    # It needs no trained model, so it runs (and is banked) first.
    results["zero_velocity"] = run_eval("zv", [
        "method_specs=zerovelocity_alg_baseline",
    ])
    bank("eval_zero_velocity")

    # ---- phase: stage-2 diffusion, three objective variants ----------------
    # flagship (k50_motion) trains BEFORE k50_latent: if the round's TPU
    # budget runs out mid-way, the checks that depend only on the flagship
    # ((a), (c), (d)) survive; only the latent leg of the APD ordering is
    # at risk.  Each variant is EVALUATED (and the partial report re-banked)
    # as soon as it finishes training, so evidence accrues per phase.
    variants = {
        "k50_motion": [f"model.train_pick_best_sample_among_k={k_full}",
                       "model.similarity_space=input_space"],
        "k1": ["model.train_pick_best_sample_among_k=1"],
        "k50_latent": [f"model.train_pick_best_sample_among_k={k_full}",
                       "model.similarity_space=latent_space"],
    }
    for vname, vargs in variants.items():
        out = os.path.join(root, f"out_diff_{vname}")
        if args.only_done_variants and not done(out):
            print(f"[capstone] train_diffusion_{vname}: not done, "
                  "skipping (--only-done-variants)")
            continue
        diff_dirs[vname] = out

        def train_diff(vargs=vargs, out=out):
            from skeletondiffusion_tpu.cli.train_diffusion import main as diff_main

            diff_main(common + diff_arch + vargs + diff_sched + resume_flag(out) + [
                f"output_log_path={out}",
                f"model.pretrained_autoencoder_path={ae_dir}/checkpoints",
                f"model.num_epochs={diff_epochs}",
                "model.batch_size=64",
                "model.if_run_validation=True",
                f"model.eval_frequency={eval_freq}",
                f"model.lr_scheduler_kwargs.warmup_duration={diff_warm}",
                "model.lr_scheduler_kwargs.update_every=1",
            ])

        run_phase(f"train_diffusion_{vname}", out, train_diff, timings)
        results[vname] = run_eval(vname, [f"checkpoint_path={out}"])
        bank(f"eval_{vname}")

    if "k50_motion" not in diff_dirs:
        sys.exit("[capstone] flagship (k50_motion) not trained yet — nothing to "
                 "report; run without --only-done-variants first")

    # ---- final report ---------------------------------------------------------
    report = bank("all")
    print(f"[capstone] report written to {args.out_json}")
    print(json.dumps(report.get("checks", {}), indent=2))
    judged = [v for v in report["checks"].values() if v is not None]
    if not args.smoke and not all(judged):
        print("[capstone] SOME CHECKS FAILED", file=sys.stderr)
        sys.exit(1)


def analyze(root, ae_dir, diff_dirs, results, *, smoke, timings, config):
    """Assemble the evidence trail for VERDICT checks (a)-(d).

    Tolerates partially-complete runs (missing variants / missing evals):
    every check that cannot be judged yet is reported as ``None``, so this
    can be called after EVERY phase to bank honest partial evidence."""
    flagship = results.get("k50_motion")
    zv = results.get("zero_velocity")
    flag_dir = diff_dirs.get("k50_motion")

    # (c) EMA validation ADE trajectory + top-k rotation evidence
    val_ade = [
        (r["step"], r["ADE"])
        for r in (read_jsonl(os.path.join(flag_dir, "metrics.jsonl")) if flag_dir else [])
        if r.get("prefix") == "valid" and "ADE" in r
    ]
    ckpt_dir = os.path.join(flag_dir, "checkpoints") if flag_dir else ""
    kept = sorted(d for d in os.listdir(ckpt_dir)
                  if os.path.isdir(os.path.join(ckpt_dir, d))) if os.path.isdir(ckpt_dir) else []

    # (d) LR floor + curriculum annealing. LR comes from the per-EPOCH log
    # rows (prefix "train") — iteration rows are only logged every
    # log_every_iters and can miss the final epochs entirely.
    ae_rows = read_jsonl(os.path.join(ae_dir, "metrics.jsonl"))
    diff_rows = read_jsonl(os.path.join(flag_dir, "metrics.jsonl")) if flag_dir else []
    ae_epoch_lr = [r["lr"] for r in ae_rows if r.get("prefix") == "train" and "lr" in r]
    diff_epoch_lr = [r["lr"] for r in diff_rows if r.get("prefix") == "train" and "lr" in r]
    ae_lr_final = ae_epoch_lr[-1] if ae_epoch_lr else None
    diff_lr_final = diff_epoch_lr[-1] if diff_epoch_lr else None
    ph_series = [(r["step"], r["ph"]) for r in ae_rows
                 if r.get("prefix") in ("train", "train_iter") and "ph" in r]
    # after the cosine cycle the horizon is RANDOMIZED in [ph_min, ph_train)
    # (reference `trainer.py:66-76`), so "annealed" shows as logged horizons
    # reaching the upper end of that range, not a single deterministic value
    ph_max_reached = max((p for _, p in ph_series), default=0)

    ae_val = [
        (r["step"], r["ADE"])
        for r in read_jsonl(os.path.join(ae_dir, "metrics.jsonl"))
        if r.get("prefix") == "valid" and "ADE" in r
    ]

    def apd_gt(a, b):
        # None (= not judged) when a variant was skipped by --only-done-variants
        if a not in results or b not in results:
            return None
        return bool(results[a]["APD"] > results[b]["APD"])

    checks = {
        "flagship_beats_zero_velocity_ade": (
            None if flagship is None or zv is None
            else bool(flagship["ADE"] < 0.6 * zv["ADE"])),
        "flagship_beats_zero_velocity_fde": (
            None if flagship is None or zv is None
            else bool(flagship["FDE"] < 0.6 * zv["FDE"])),
        "apd_ordering_motion_gt_latent": apd_gt("k50_motion", "k50_latent"),
        "apd_ordering_latent_gt_k1": apd_gt("k50_latent", "k1"),
        # outer comparison of the same ablation: judgeable as soon as k1
        # finishes, even if the k50_latent leg is cut off by the budget
        "apd_ordering_motion_gt_k1": apd_gt("k50_motion", "k1"),
        "ema_val_ade_improved": (None if not val_ade else
                                 (len(val_ade) >= 2 and
                                  min(a for _, a in val_ade[1:]) < val_ade[0][1])),
        "topk_checkpoints_rotated": (None if flag_dir is None else len(kept) >= 2),
        "ae_lr_reached_floor": (None if ae_lr_final is None
                                else ae_lr_final <= 1.0e-4 * 1.001),
        "diff_lr_reached_floor": (None if diff_lr_final is None
                                  else diff_lr_final <= 1.0e-4 * 1.001),
        "curriculum_fully_annealed": (None if not ph_series else
                                      ph_max_reached >= 0.9 * config["pred_len"]),
        "ae_val_ade_improved": (None if not ae_val else
                                (len(ae_val) >= 2 and
                                 min(a for _, a in ae_val[1:]) < ae_val[0][1])),
    }
    # Raw margins next to the booleans (VERDICT r4 weak #2): a pass by 1%
    # should read differently from a pass by 5x.
    margins = {
        "flagship_over_zv_ade_ratio": (
            None if flagship is None or zv is None or not zv["ADE"]
            else round(flagship["ADE"] / zv["ADE"], 4)),
        "flagship_over_zv_fde_ratio": (
            None if flagship is None or zv is None or not zv["FDE"]
            else round(flagship["FDE"] / zv["FDE"], 4)),
        "apd_motion_over_latent_ratio": (
            None if "k50_motion" not in results or "k50_latent" not in results
            or not results["k50_latent"]["APD"]
            else round(results["k50_motion"]["APD"] / results["k50_latent"]["APD"], 4)),
        "apd_latent_over_k1_ratio": (
            None if "k50_latent" not in results or "k1" not in results
            or not results["k1"]["APD"]
            else round(results["k50_latent"]["APD"] / results["k1"]["APD"], 4)),
        "apd_motion_over_k1_ratio": (
            None if "k50_motion" not in results or "k1" not in results
            or not results["k1"]["APD"]
            else round(results["k50_motion"]["APD"] / results["k1"]["APD"], 4)),
        "ema_val_ade_first_to_best_ratio": (
            None if len(val_ade) < 2 or not val_ade[0][1]
            else round(min(a for _, a in val_ade[1:]) / val_ade[0][1], 4)),
        "ae_val_ade_first_to_best_ratio": (
            None if len(ae_val) < 2 or not ae_val[0][1]
            else round(min(a for _, a in ae_val[1:]) / ae_val[0][1], 4)),
        "curriculum_ph_max_over_pred_len": (
            None if not ph_series
            else round(ph_max_reached / config["pred_len"], 4)),
    }
    missing = [v for v in ("k1", "k50_motion", "k50_latent") if v not in results]
    return {
        "description": "Two-stage convergence capstone on synthetic rigid-skeleton "
                       "motion (scripts/convergence_capstone.py); VERDICT r3 #1",
        "smoke": smoke,
        "partial_variants_missing": missing,
        "config": config,
        "metrics": {k: {m: float(v) for m, v in r.items() if isinstance(v, (int, float))}
                    for k, r in results.items()},
        "valid_ade_trajectory_k50_motion": val_ade,
        "valid_ade_trajectory_autoencoder": ae_val,
        "kept_checkpoints_k50_motion": kept,
        "final_lr": {"autoencoder": ae_lr_final, "diffusion": diff_lr_final},
        "curriculum_ph_max": ph_max_reached,
        # Free limb-realism signal (VERDICT r4 ask #6): the procedural data's
        # FK is rigid, so ground-truth limb stretch is exactly 0 mm by
        # construction — the flagship's StretchMean/RMSE (mm) are directly
        # interpretable as its own limb violation, matching the reference's
        # headline table rows (/root/reference/README.md:281-283).
        "limb_stretch_flagship_mm": (None if flagship is None else {
            "StretchMean": flagship.get("StretchMean"),
            "StretchRMSE": flagship.get("StretchRMSE"),
            "gt_stretch_mm": 0.0,
        }),
        "checks": checks,
        "margins": margins,
    }


if __name__ == "__main__":
    main()
