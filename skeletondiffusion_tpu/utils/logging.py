"""Training observability: JSONL metrics log (always) + optional
TensorBoard — functional replacement for the reference's ignite
TensorboardLogger handlers (`src/utils/tensorboard.py:8-122`: per-iteration
loss/lr, weight/grad norms every 100 iterations, validation metric groups).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _global_norm(tree):
    """Global L2 norm of a pytree, computed ON DEVICE so only one scalar
    crosses to host.  The naive host-side version ships every leaf (the
    full parameter tree — ~128 MB for the flagship denoiser) over the
    device link per call, which dominates the train loop on remote or
    tunneled devices."""
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in jax.tree.leaves(tree)))


@jax.jit
def _leaf_norms(tree):
    """Per-leaf L2 norms on device — one small scalar-tree transfer instead
    of the full parameter tree."""
    return jax.tree.map(
        lambda l: jnp.sqrt(jnp.sum(jnp.square(l.astype(jnp.float32)))), tree
    )


class MetricsLogger:
    def __init__(self, log_dir: str, log_every: int = 1, norms_every: int = 100):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self.log_every = log_every
        self.norms_every = norms_every
        self._tb = None
        try:  # optional: tensorboardX / tf not shipped in this image
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def log(self, step: int, values: Dict[str, Any], prefix: str = "train"):
        rec = {"step": step, "time": time.time(), "prefix": prefix}
        rec.update({k: float(v) for k, v in values.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def log_param_norms(self, step: int, params, grads=None, grad_norm=None):
        """Per-tree global norms (the reference logs per-weight scalars every
        100 iterations, `tensorboard.py:58-96`; a global norm captures the
        same signal at a fraction of the host cost).  ``grad_norm``: a
        precomputed (device) scalar — cheaper than shipping the grad tree."""
        if step % self.norms_every != 0:
            return
        vals = {"param_global_norm": float(_global_norm(params))}
        if grad_norm is not None:
            vals["grad_global_norm"] = float(grad_norm)
        elif grads is not None:
            vals["grad_global_norm"] = float(_global_norm(grads))
        self.log(step, vals, prefix="norms")

    def log_param_histograms(self, step: int, params, grads=None):
        """Per-epoch weight/grad distributions; reference
        `src/utils/tensorboard.py:98-122` (ignite Weights/GradsHistHandler,
        attached EPOCH_COMPLETED).  Full histograms go to TensorBoard when
        available; the JSONL stream gets compact per-layer L2 norms either
        way, so the signal survives without TB."""

        def walk(tree, tag):
            rec = {}
            # per-leaf norms computed on device; a single scalar-tree D2H
            # transfer replaces shipping the whole parameter tree to host
            flat, _ = jax.tree_util.tree_flatten_with_path(
                jax.device_get(_leaf_norms(tree))
            )
            for path, norm in flat:
                name = "/".join(
                    str(getattr(k, "key", getattr(k, "idx", k))) for k in path
                )
                rec[f"{tag}/{name}"] = float(norm)
            if self._tb is not None:
                # full arrays cross to host only when a TB writer consumes them
                aflat, _ = jax.tree_util.tree_flatten_with_path(tree)
                for path, leaf in aflat:
                    name = "/".join(
                        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
                    )
                    self._tb.add_histogram(f"{tag}/{name}", np.asarray(leaf), step)
            return rec

        vals = walk(params, "weights_norm")
        if grads is not None:
            vals.update(walk(grads, "grads_norm"))
        self.log(step, vals, prefix="hist")

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


class AverageTimer:
    """Per-batch wall-clock stats behind ``if_measure_time``; reference
    `src/utils/time.py:5-20`."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        assert self._t0 is not None
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self) -> Dict[str, float]:
        arr = np.asarray(self.times)
        if arr.size == 0:
            return {}
        return {
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "n": int(arr.size),
        }
