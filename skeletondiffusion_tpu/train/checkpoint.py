"""Checkpoint/resume via Orbax: params, optimizer state, EMA, step counters,
scheduler state and the RNG key — the TPU equivalent of the reference's
ignite Checkpoint object set (`train_diffusion.py:100-112`,
`src/core/trainer.py:168-179`).

Retention mirrors the reference: a rolling window of the top-k checkpoints
by validation score plus a rolling "latest" (`train_diffusion.py:100-104`:
top-10 by −val ADE + latest; AE: top-20 by −MPJPE + periodic saves).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, n_saved: int = 10, score_name: str = "score"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.n_saved = n_saved
        self.score_name = score_name
        self._ckpt = ocp.StandardCheckpointer()
        self._index_path = os.path.join(self.directory, "index.json")
        self._index: List[Dict] = []
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)

    # ---- save ---------------------------------------------------------------
    def _write_index(self):
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)

    def save(self, state: Any, step: int, score: Optional[float] = None, tag: str = "ckpt"):
        """Save; keep best ``n_saved`` by score (higher is better — pass
        −ADE etc.) plus the rolling latest."""
        name = f"{tag}_{step}"
        path = os.path.join(self.directory, name)
        self._ckpt.save(path, state, force=True)
        # Orbax saves asynchronously; without this barrier a process exiting
        # right after training leaves .orbax-checkpoint-tmp corpses and a
        # "cannot schedule new futures after interpreter shutdown" error
        self._ckpt.wait_until_finished()
        # re-saving the same step (crash → resume re-running an epoch) must
        # REPLACE the stale entry: a duplicate name would later make _remove
        # delete the shared directory while the twin entry survives in the
        # index pointing at nothing
        self._index = [e for e in self._index if e["name"] != name]
        self._index.append({"name": name, "step": step, "score": score})
        if score is not None:
            scored = [e for e in self._index if e["score"] is not None]
            scored.sort(key=lambda e: e["score"], reverse=True)
            for e in scored[self.n_saved :]:
                if e["step"] != step:
                    self._remove(e)
        self._write_index()

    def save_latest(self, state: Any, step: int):
        prev = [e for e in self._index if e["name"].startswith("latest")]
        name = f"latest_{step}"
        self._ckpt.save(os.path.join(self.directory, name), state, force=True)
        self._ckpt.wait_until_finished()
        self._index.append({"name": name, "step": step, "score": None})
        for e in prev:
            self._remove(e)
        self._write_index()

    def _remove(self, entry: Dict):
        import shutil

        path = os.path.join(self.directory, entry["name"])
        if os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)
        self._index = [e for e in self._index if e["name"] != entry["name"]]

    # ---- load -------------------------------------------------------------
    def latest_path(self) -> Optional[str]:
        if not self._index:
            return None
        entry = max(self._index, key=lambda e: e["step"])
        return os.path.join(self.directory, entry["name"])

    def best_path(self) -> Optional[str]:
        scored = [e for e in self._index if e["score"] is not None]
        if not scored:
            return self.latest_path()
        entry = max(scored, key=lambda e: e["score"])
        return os.path.join(self.directory, entry["name"])

    @staticmethod
    def _sharding_of(x):
        """Restore onto the target leaf's own sharding (single-device by
        default) — without it Orbax falls back to the sharding file recorded
        at save time and warns that restoring on a different topology is
        unsafe."""
        import jax

        if isinstance(x, jax.Array):
            return x.sharding
        # numpy / scalar leaves: restore onto this process's first device —
        # jax.devices()[0] is process 0's device and not addressable from
        # other hosts in a multihost run
        return jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

    def restore(self, target: Any, path: Optional[str] = None) -> Any:
        path = path or self.latest_path()
        assert path is not None, "no checkpoint to restore"
        import jax

        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=self._sharding_of(x))
            if hasattr(x, "shape") else x,
            target,
        )
        return self._ckpt.restore(path, abstract)

    def restore_raw(self, path: Optional[str] = None) -> Any:
        """Target-free restore (inspection, tests, tooling): every array
        leaf onto this process's default device.  Builds restore args from
        the checkpoint's own metadata so Orbax never falls back to the
        sharding file recorded at save time (which would warn and be unsafe
        across topologies)."""
        path = path or self.latest_path()
        assert path is not None, "no checkpoint to restore"
        import jax

        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        with ocp.PyTreeCheckpointer() as ckptr:
            meta = ckptr.metadata(path).item_metadata
            restore_args = jax.tree.map(
                lambda _: ocp.type_handlers.ArrayRestoreArgs(sharding=sharding), meta
            )
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))

    def restore_partial(self, target: Any, path: Optional[str] = None) -> Any:
        """Restore only the subtree present in ``target`` (e.g. params-only
        for the frozen-AE load, ignoring stored optimizer state)."""
        path = path or self.latest_path()
        assert path is not None, "no checkpoint to restore"
        import jax

        restore_args = jax.tree.map(
            lambda x: ocp.type_handlers.ArrayRestoreArgs(sharding=self._sharding_of(x)),
            target,
        )
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(
                path,
                args=ocp.args.PyTreeRestore(
                    item=target, restore_args=restore_args, partial_restore=True
                ),
            )


def save_host_state(directory: str, state: Dict):
    """Small host-side state (lr scheduler, curriculum rng, epoch) as json."""
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "host_state.json"), "w") as f:
        json.dump(state, f)


def load_host_state(directory: str) -> Optional[Dict]:
    path = os.path.join(directory, "host_state.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
