"""Prediction storer: append-only on-disk dump of 50-sample predictions /
GT / observations + metadata yaml — reference `src/utils/store.py:7-57`
(zarr upstream; npz shards here, zarr not shipped in this image).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import yaml


class ResultStorer:
    def __init__(self, out_dir: str, store_gt: bool = False):
        self.out_dir = out_dir
        self.store_gt = store_gt
        os.makedirs(out_dir, exist_ok=True)
        # a re-run into the same dir must not leave a previous (longer)
        # run's tail shards behind: load() concatenates every shard_* file,
        # so stale leftovers would silently mix two runs' predictions
        for name in os.listdir(out_dir):
            if name.startswith("shard_") and name.endswith((".npz", ".yaml")):
                os.remove(os.path.join(out_dir, name))
        self._shard = 0

    def append(self, pred: np.ndarray, obs: Optional[np.ndarray] = None,
               target: Optional[np.ndarray] = None, metadata=None):
        path = os.path.join(self.out_dir, f"shard_{self._shard:05d}.npz")
        arrays = {"pred": np.asarray(pred)}
        if obs is not None:
            arrays["obs"] = np.asarray(obs)
        if self.store_gt and target is not None:
            arrays["target"] = np.asarray(target)
        np.savez_compressed(path, **arrays)
        if metadata is not None:
            with open(os.path.join(self.out_dir, f"shard_{self._shard:05d}.yaml"), "w") as f:
                yaml.safe_dump(metadata, f)
        self._shard += 1

    def finalize(self, config: Dict):
        with open(os.path.join(self.out_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(config, f)

    @staticmethod
    def load(out_dir: str):
        """Read a dump back: ``(arrays, config)`` with every stored key
        concatenated over shards in write order (the analysis-side
        counterpart of the reference's zarr reads).

        Raises if a key is present in only SOME shards — silently
        concatenating the shards that have it would misalign its rows
        against the keys that span every shard."""
        import glob

        paths = sorted(glob.glob(os.path.join(out_dir, "shard_*.npz")))
        arrays: Dict[str, list] = {}
        present: Dict[str, list] = {}
        for i, path in enumerate(paths):
            with np.load(path) as shard:
                for k in shard.files:
                    arrays.setdefault(k, []).append(shard[k])
                    present.setdefault(k, []).append(i)
        ragged = {k: v for k, v in present.items() if len(v) != len(paths)}
        if ragged:
            raise ValueError(
                f"keys {sorted(ragged)} are present in only some of the "
                f"{len(paths)} shards (shard indices {ragged}); rows would "
                "misalign across keys — load those shards individually"
            )
        out = {k: np.concatenate(v, axis=0) for k, v in arrays.items()}
        cfg_path = os.path.join(out_dir, "config.yaml")
        config = None
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                config = yaml.safe_load(f)
        return out, config
