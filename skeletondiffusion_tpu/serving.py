"""Serving export: AOT-compile the prediction function to a self-contained
on-disk artifact (StableHLO via ``jax.export`` + msgpack weights + manifest)
that loads and runs WITHOUT the model-construction code.

TPU-native deployment story with no reference counterpart — the reference
serves by reconstructing its Python classes around a torch checkpoint
(`src/eval_prepare_model.py`).  Here the whole prediction program
(past-embedding → S-sample diffusion scan → decode rollout) is captured as
one version-pinned StableHLO module: a serving host needs jax + the artifact,
not the package's model zoo, and the compiled program is byte-stable across
library refactors.

Numerics: on the unfused fp32 path the exported program is bit-exact vs the
live predictor (tests/test_serving.py).  On the TPU fused-bf16 flagship path
the export wrapper traces a marginally different program, so XLA's fusion
(and therefore bf16 rounding) can differ: measured ≤4.9e-4 max deviation in
input space at the bench config (≈0.7 mm metric — same order as the
documented bf16-vs-fp32 decode deviation, docs/bf16_eval_quality.json), and
throughput matches the live bench rate (295 preds/s at batch 64 on one v5e).

Artifact layout (a directory):
    predict.stablehlo   serialized jax.export module (all platforms listed
                        in the manifest; input = (ae/diff params leaves...,
                        key_data, obs))
    params.msgpack      weights pytree (flax msgpack, numpy leaves)
    manifest.json       shapes, dtypes, static config, jax/export versions
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MLIR_FILE = "predict.stablehlo"
PARAMS_FILE = "params.msgpack"
MANIFEST_FILE = "manifest.json"
_FORMAT_VERSION = 1


def export_predictor(
    predictor,
    out_dir: str,
    batch_size: int,
    *,
    num_samples: Optional[int] = None,
    pred_length: Optional[int] = None,
    obs_shape: Optional[Tuple[int, ...]] = None,
    platforms: Optional[Sequence[str]] = None,
    mesh=None,
) -> str:
    """Export ``predictor`` (``SkeletonDiffusionPredictor``) at a fixed batch
    size to ``out_dir``; returns ``out_dir``.

    The exported function maps ``(key_data [2] uint32, obs [B,T,J,3] input
    space) → pred [B,S,T',J,3] input space``.  ``platforms`` defaults to the
    current backend only — the Pallas fused paths embed TPU-specific custom
    calls that cannot be re-lowered for other platforms after tracing.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``'data'`` axis — the
    program is exported SPMD: batch sharded over 'data', weights replicated,
    XLA's GSPMD partitioner baked into the artifact.  Serving then requires
    the same device count (``ServingModel(path, mesh=...)``) and
    ``batch_size`` must be divisible by the data-axis size.
    """
    S = num_samples or predictor.num_samples
    ph = pred_length or predictor.pred_length
    sk = predictor.skeleton
    if obs_shape is None:
        obs_shape = (batch_size, sk.obs_length, sk.num_nodes, 3)
    assert obs_shape[0] == batch_size, (obs_shape, batch_size)
    if platforms is None:
        platforms = [jax.default_backend()]

    def serve(ae_params, diff_params, key_data, obs):
        rng = jax.random.wrap_key_data(key_data)
        pred, _ = predictor._predict(
            ae_params, diff_params, rng, obs, num_samples=S, pred_length=ph
        )
        return pred

    key_data_sds = jax.ShapeDtypeStruct(
        jax.random.key_data(jax.random.key(0)).shape, jnp.uint32
    )
    obs_sds = jax.ShapeDtypeStruct(obs_shape, jnp.float32)
    params_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        (predictor.ae_params, predictor.diff_params),
    )
    from jax import export as jax_export

    mesh_info = None
    if mesh is not None:
        from .parallel import batch_sharding, replicated

        assert batch_size % mesh.shape["data"] == 0, (batch_size, dict(mesh.shape))
        rep, bsh = replicated(mesh), batch_sharding(mesh)
        serve_fn = jax.jit(
            serve,
            in_shardings=(
                jax.tree.map(lambda _: rep, params_sds[0]),
                jax.tree.map(lambda _: rep, params_sds[1]),
                rep, bsh,
            ),
            out_shardings=bsh,
        )
        mesh_info = {"axes": dict(mesh.shape), "num_devices": mesh.size}
    else:
        serve_fn = jax.jit(serve)

    exported = jax_export.export(serve_fn, platforms=list(platforms))(
        params_sds[0], params_sds[1], key_data_sds, obs_sds
    )

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, MLIR_FILE), "wb") as f:
        f.write(exported.serialize())

    import flax.serialization as fs

    host_params = jax.tree.map(
        np.asarray, {"ae": predictor.ae_params, "diff": predictor.diff_params}
    )
    with open(os.path.join(out_dir, PARAMS_FILE), "wb") as f:
        f.write(fs.msgpack_serialize(host_params))

    manifest = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batch_size": batch_size,
        "num_samples": S,
        "pred_length": ph,
        "obs_shape": list(obs_shape),
        "key_data_shape": list(key_data_sds.shape),
        "fused_denoiser": bool(getattr(predictor, "use_fused_denoiser", False)),
        "fused_decode": bool(getattr(predictor, "use_fused_decode", False)),
        "mesh": mesh_info,
    }
    with open(os.path.join(out_dir, MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


class ServingModel:
    """A loaded serving artifact: ``model(rng_key, obs) → pred``.

    Needs only jax (+flax for the msgpack weights) — no model classes, no
    configs, no checkpoint machinery.
    """

    def __init__(self, artifact_dir: str, mesh=None):
        from jax import export as jax_export
        import flax.serialization as fs

        with open(os.path.join(artifact_dir, MANIFEST_FILE)) as f:
            self.manifest: Dict = json.load(f)
        assert self.manifest["format_version"] == _FORMAT_VERSION, self.manifest
        with open(os.path.join(artifact_dir, MLIR_FILE), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        with open(os.path.join(artifact_dir, PARAMS_FILE), "rb") as f:
            params = fs.msgpack_restore(f.read())
        self._ae_params, self._diff_params = params["ae"], params["diff"]
        mesh_info = self.manifest.get("mesh")
        self._shard_obs = None
        if mesh_info is not None:
            assert mesh is not None, (
                f"artifact was exported SPMD over {mesh_info['axes']}; "
                "pass a matching jax.sharding.Mesh"
            )
            assert dict(mesh.shape) == mesh_info["axes"], (dict(mesh.shape), mesh_info)
            from .parallel import batch_sharding, replicate

            self._ae_params = replicate(mesh, self._ae_params)
            self._diff_params = replicate(mesh, self._diff_params)
            self._shard_obs = lambda obs: jax.device_put(obs, batch_sharding(mesh))
        self._call = jax.jit(
            lambda key_data, obs: self._exported.call(
                self._ae_params, self._diff_params, key_data, obs
            )
        )

    @property
    def batch_size(self) -> int:
        return self.manifest["batch_size"]

    @property
    def num_samples(self) -> int:
        return self.manifest["num_samples"]

    def __call__(self, rng: jax.Array, obs) -> jax.Array:
        obs = jnp.asarray(obs, jnp.float32)
        want = tuple(self.manifest["obs_shape"])
        assert obs.shape == want, f"obs shape {obs.shape} != exported {want}"
        if self._shard_obs is not None:
            obs = self._shard_obs(obs)
        return self._call(jax.random.key_data(rng), obs)
