#!/usr/bin/env python
"""Training-step MFU: time the FULL-CONFIG train steps on the TPU and report
useful-FLOP throughput vs the v5e bf16 peak (the training-side counterpart
of bench.py's eval MFU; analytical FLOPs from utils/flops.py).

    python scripts/train_mfu.py [--batch 64] [--k 50] [--out docs/train_mfu.json]

Timing rules for this hardware (see .claude/skills/verify/SKILL.md): vary
inputs per rep and force a device fetch per rep.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

from train_memory_analysis import LATENT, OBS_LEN, PRED_LEN, build_stage1, build_stage2


def time_step(fn, args, reps: int = 7):
    """Median step seconds.  The state arg is donated — thread the returned
    state through; vary x per rep; fetch the loss to force completion."""
    state, rng, x, y, *rest = args
    out = fn(state, rng, x, y, *rest)
    state = out[0]
    float(out[1])  # warmup + compile fence
    times = []
    for i in range(reps):
        xi = x + jnp.asarray(i, x.dtype) * 1e-6
        ki = jax.random.fold_in(rng, i)
        t0 = time.perf_counter()
        out = fn(state, ki, xi, y, *rest)
        state = out[0]
        _ = float(out[1])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--remat", action="store_true",
                   help="model.remat_denoiser=True (stage 2 only)")
    p.add_argument("--stage", type=int, default=0, choices=(0, 1, 2),
                   help="0 = both stages")
    p.add_argument("--out", default=None,
                   help="JSON path; entries with the same (stage, batch, "
                        "remat, dtype) are replaced, others kept")
    args = p.parse_args()
    cdt = None if args.dtype in ("float32", "fp32") else args.dtype

    from skeletondiffusion_tpu.utils.flops import (
        V5E_BF16_PEAK_FLOPS, mfu, train_step_flops_stage1, train_step_flops_stage2)

    N = 21  # amass hmp, if_consider_hip=False
    entries = []

    if args.stage in (0, 2):
        fn, fargs = build_stage2(args.batch, args.k, cdt, remat=args.remat)
        t2 = time_step(fn, fargs)
        f2 = train_step_flops_stage2(N, args.batch, args.k,
                                     obs_len=OBS_LEN, pred_len=PRED_LEN, latent=LATENT)
        entries.append({
            "stage": 2, "batch": args.batch, "k": args.k, "remat": args.remat,
            "compute_dtype": args.dtype, "step_s": round(t2, 4),
            "items_per_s": round(args.batch / t2, 1),
            "useful_gflops": round(f2["total"] / 1e9, 1),
            "achieved_tflops_s": round(f2["total"] / t2 / 1e12, 2),
            "mfu": round(mfu(f2["total"] / t2), 4),
            "phase_gflops": {k: round(v / 1e9, 1) for k, v in f2.items()},
        })

    if args.stage in (0, 1):
        fn, fargs = build_stage1(args.batch, cdt)
        t1 = time_step(fn, fargs)
        f1 = train_step_flops_stage1(N, args.batch, obs_len=OBS_LEN,
                                     pred_len=PRED_LEN, latent=LATENT)
        entries.append({
            "stage": 1, "batch": args.batch, "remat": False,
            "compute_dtype": args.dtype, "step_s": round(t1, 4),
            "items_per_s": round(args.batch / t1, 1),
            "useful_gflops": round(f1["total"] / 1e9, 1),
            "achieved_tflops_s": round(f1["total"] / t1 / 1e12, 2),
            "mfu": round(mfu(f1["total"] / t1), 4),
        })

    results = {"backend": jax.default_backend(),
               "peak_tflops_s": V5E_BF16_PEAK_FLOPS / 1e12, "stages": entries}
    print(json.dumps(results, indent=2))
    if args.out:
        if os.path.exists(args.out):
            with open(args.out) as f:
                prior = json.load(f)
            key = lambda e: (e["stage"], e.get("batch"), bool(e.get("remat")),
                             e.get("compute_dtype"))
            new_keys = {key(e) for e in entries}
            kept = [e for e in prior.get("stages", []) if key(e) not in new_keys]
            results["stages"] = kept + entries
            for extra in prior:
                if extra not in results and extra != "stages":
                    results[extra] = prior[extra]
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
