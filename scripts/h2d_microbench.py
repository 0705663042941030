#!/usr/bin/env python
"""Measure host→device transfer cost for eval-shaped batches (VERDICT r3
weak #5): the eval loop's total wall (1.35 s/batch at batch 256) exceeds its
steady-state p50 (0.79 s) and ROADMAP attributes the difference to the axon
tunnel serializing H2D with compute.  This script turns that attribution
into a measurement:

1. **Idle H2D bandwidth** — `jax.device_put` + block of an eval-shaped batch
   (obs [B,30,22,3] + target [B,120,22,3] + deduped mm-GT rows), fresh
   arrays per rep (the runtime caches repeated buffers).
2. **H2D while the device is busy** — the same transfers issued while a
   long compute chain occupies the chip; if the tunnel serializes, the
   busy-transfer completes only after the chain, inflating per-batch wall.

Writes ``docs/h2d_microbench.json``.  Run on the real TPU (no other TPU
process active):  python scripts/h2d_microbench.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def eval_batch(rng: np.random.Generator, batch: int, mm_rows: int):
    """Arrays with the dtypes/shapes the AMASS probabilistic eval loader
    emits per batch (deduped mm-GT: unique future rows + gather table)."""
    return {
        "obs": rng.standard_normal((batch, 30, 22, 3), dtype=np.float32),
        "pred": rng.standard_normal((batch, 120, 22, 3), dtype=np.float32),
        "mm_gt": rng.standard_normal((mm_rows, 120, 22, 3), dtype=np.float32),
        "mm_idx": rng.integers(0, mm_rows, (batch, 64)).astype(np.int32),
        "mm_mask": np.ones((batch, 64), dtype=bool),
    }


def put_and_block(batch_np):
    dev = {k: jax.device_put(v) for k, v in batch_np.items()}
    jax.block_until_ready(dev)
    return dev


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--mm-rows", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "h2d_microbench.json"))
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    nbytes = sum(v.nbytes for v in eval_batch(rng, args.batch, args.mm_rows).values())
    mb = nbytes / 2**20

    # a compute chain long enough (~0.5 s) to emulate one eval batch's
    # sampling program occupying the chip
    x0 = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def chain(x):
        def body(c, _):
            c = c @ c * 1e-3 + c
            return c, ()
        return jax.lax.scan(body, x, (), length=400)[0]

    chain(x0).block_until_ready()  # compile
    t0 = time.perf_counter()
    np.asarray(chain(x0))[0, 0]
    chain_s = time.perf_counter() - t0

    # 1) idle H2D (fresh arrays per rep — runtime caches repeat buffers)
    idle = []
    for _ in range(args.reps):
        b = eval_batch(rng, args.batch, args.mm_rows)
        t0 = time.perf_counter()
        put_and_block(b)
        idle.append(time.perf_counter() - t0)

    # 2) H2D issued while the chip runs the chain: measure wall for
    #    (dispatch chain → device_put batch → block batch) minus chain time
    busy = []
    for _ in range(args.reps):
        b = eval_batch(rng, args.batch, args.mm_rows)
        fut = chain(x0)               # async dispatch, chip busy
        t0 = time.perf_counter()
        put_and_block(b)
        busy.append(time.perf_counter() - t0)
        fut.block_until_ready()

    idle_p50 = float(np.median(idle))
    busy_p50 = float(np.median(busy))
    report = {
        "description": "eval-shaped batch H2D through the current JAX client "
                       "(scripts/h2d_microbench.py); VERDICT r3 weak #5",
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "batch": args.batch, "mm_rows": args.mm_rows,
        "payload_mb": round(mb, 2),
        "chain_s": round(chain_s, 4),
        "h2d_idle_s": [round(t, 4) for t in idle],
        "h2d_while_device_busy_s": [round(t, 4) for t in busy],
        "h2d_idle_p50_s": round(idle_p50, 4),
        "h2d_busy_p50_s": round(busy_p50, 4),
        "idle_bandwidth_mb_s": round(mb / idle_p50, 1),
        "serialization_penalty_s": round(busy_p50 - idle_p50, 4),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
