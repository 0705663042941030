#!/usr/bin/env python
"""End-to-end eval-LOOP benchmark: compute_metrics over a synthetic
full-shape AMASS test set (obs 30 / pred 120 / 22 joints) at the flagship
model configuration, with the complete inline probabilistic metric suite
(APD/ADE/FDE/MAE/MMADE/MMFDE/limb family + CMD + APDE).

Measures the steady-state per-batch wall time (p50 over post-warmup
batches, per-batch timer inside the loop) — the number PARITY.md's
"projected AMASS split" row is derived from.

    python scripts/eval_loop_bench.py [--segments 1008] [--batch 252]
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

import jax
import jax.numpy as jnp
import numpy as np

OBS, PRED, LAT, J = 30, 120, 96, 22
# --skeleton h36m: 17 joints / 16 nodes at 0.5 s/2 s @50 fps task shapes
# (obs 25 / pred 100), the reference's H36M protocol (~8 min RTX6000 for
# its 5,168-segment test split, README.md:231)
# freeman: 18 joints / 17 nodes @30 fps -> obs 15 / pred 60
SKELETONS = {"amass": ("amass", 22, 30, 120), "h36m": ("h36m", 17, 25, 100),
             "freeman": ("freeman", 18, 15, 60)}


def build_dataset(root: str, n_segments: int, skeleton):
    import pandas as pd

    from skeletondiffusion_tpu.data import (
        AMASSDataset,
        compute_multimodal_gt_for_dataset,
    )

    rng = np.random.default_rng(0)
    clip_len = OBS + PRED + 8
    # enough clips that segments at stride 4 cover n_segments
    per_clip = (clip_len - OBS - PRED) // 4 + 1
    n_clips = -(-n_segments // per_clip)
    # plain noise poses (NOT a random walk): last-obs-frame distances then
    # concentrate around √(2·63)·0.3 ≈ 3.4, so a 2.0 threshold yields sparse
    # mm-GT neighbor sets like real AMASS — a walk makes everyone a neighbor
    # and the padded MMADE tensor blows HBM
    positions = {"DFaust": {
        fi: rng.standard_normal((clip_len, J, 3)).astype(np.float32) * 0.3
        for fi in range(n_clips)
    }}
    np.savez(os.path.join(root, "data_3d_amass.npz"), positions_3d=positions)
    rows = [
        {"dataset": "DFaust", "file": f"f{fi}", "file_idx": fi,
         "pred_init": init, "pred_end": init + PRED - 1}
        for fi in range(n_clips)
        for init in range(OBS, clip_len - PRED + 1, 4)
    ][:n_segments]
    pd.DataFrame(rows).to_csv(os.path.join(root, "segments_test.csv"), index=False)

    ds_tmp = AMASSDataset(
        datasets=["DFaust"], split="test", precomputed_folder=root,
        skeleton=skeleton, obs_length=OBS, pred_length=PRED,
        segments_path=os.path.join(root, "segments_test.csv"),
        if_consider_hip=False, silent=True,
    )
    compute_multimodal_gt_for_dataset(
        ds_tmp, skeleton, multimodal_threshold=2.0,
        dest_path=os.path.join(root, "mmgt_test.txt"),
    )
    pd.DataFrame(
        [{"id": i, "gt_APD": 1.0} for i in range(len(ds_tmp))]
    ).to_csv(os.path.join(root, "mmapd_GT.csv"), index=False)
    return AMASSDataset(
        datasets=["DFaust"], split="test", precomputed_folder=root,
        skeleton=skeleton, obs_length=OBS, pred_length=PRED,
        segments_path=os.path.join(root, "segments_test.csv"),
        if_consider_hip=False, if_load_mmgt=True, silent=True,
        if_compute_cmd=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=1008)
    ap.add_argument("--batch", type=int, default=252)
    ap.add_argument("--samples", type=int, default=50)
    ap.add_argument("--ab", action="store_true",
                    help="also run with SKELDIFF_EVAL_PIPELINE=0 (sync drain)")
    ap.add_argument("--skeleton", default="amass", choices=sorted(SKELETONS))
    args = ap.parse_args()

    from skeletondiffusion_tpu.diffusion.manager import create_diffusion
    from skeletondiffusion_tpu.eval_pipeline import (
        SkeletonDiffusionPredictor,
        compute_metrics,
    )
    from skeletondiffusion_tpu.models import AutoEncoder
    from skeletondiffusion_tpu.skeleton import create_skeleton
    from skeletondiffusion_tpu.utils import AverageTimer

    global OBS, PRED, J
    ds_name, J, OBS, PRED = SKELETONS[args.skeleton]
    skeleton = create_skeleton(
        dataset_name=ds_name, motion_repr_type="SkeletonRescalePose",
        num_joints=J, pose_box_size=1.5, obs_length=OBS, pred_length=PRED,
        if_consider_hip=False,
    )
    N = skeleton.num_nodes
    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=96, decoder_hidden_size=96,
        latent_size=LAT, node_types=skeleton.nodes_type_id,
        compute_dtype="bfloat16",
    )
    ae_params = ae.init(
        jax.random.key(0), jnp.zeros((1, PRED, N, 3)), jnp.zeros((1, OBS, N, 3)),
        ph=PRED, method=AutoEncoder.autoencode,
    )
    diffusion, den = create_diffusion(
        skeleton, diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency", latent_size=LAT,
        diffusion_conditioning=True, diffusion_timesteps=10,
        diffusion_arch={"depth": 4, "attn_heads": 8, "attn_dim_head": 32,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
        compute_dtype="bfloat16",
    )
    dparams = den.init(
        jax.random.key(1), jnp.zeros((1, N, LAT)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, N, LAT)),
    )
    predictor = SkeletonDiffusionPredictor(
        skeleton, ae, ae_params, diffusion, dparams,
        num_samples=args.samples, pred_length=PRED,
    )

    import time

    with tempfile.TemporaryDirectory() as root:
        dataset = build_dataset(root, args.segments, skeleton)

        def run_once(tag):
            timer = AverageTimer()
            t0 = time.perf_counter()
            results = compute_metrics(
                predictor, dataset, skeleton, batch_size=args.batch,
                num_samples=args.samples, stats_mode="probabilistic",
                if_compute_cmd=True, if_compute_apde=True,
                mmapd_gt_path=os.path.join(root, "mmapd_GT.csv"),
                timer=timer, silent=True,
            )
            wall = time.perf_counter() - t0
            return results, timer.summary(), wall

        # warmup pass compiles every program (persistent-cached); the modes
        # below then measure steady-state loop behavior only
        run_once("warmup")
        report = {"skeleton": args.skeleton, "segments": args.segments,
                  "batch": args.batch, "samples": args.samples}
        modes = (("pipelined", "1"), ("sync", "0")) if args.ab else (("pipelined", "1"),)
        for tag, flag in modes:
            os.environ["SKELDIFF_EVAL_PIPELINE"] = flag
            results, t, wall = run_once(tag)
            p50_s = t.get("p50_ms", float("nan")) / 1e3
            n_batches = t.get("n", 0)
            pps = args.segments / wall
            report[tag] = {
                "n_batches": n_batches,
                "batch_p50_s": round(p50_s, 3),
                "total_wall_s": round(wall, 3),
                "preds_per_sec_with_metrics": round(pps, 1),
                # real test-split sizes (shipped segments_test.csv files)
                "projected_full_split_s": round(
                    {"amass": 12726, "h36m": 5168, "freeman": 11015}[args.skeleton] / pps, 1),
                "ADE": round(float(results.get("ADE", float("nan"))), 4),
                "APD": round(float(results.get("APD", float("nan"))), 4),
            }
        print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
