"""Serving export: AOT-compile the prediction function to a self-contained
on-disk artifact (StableHLO via ``jax.export`` + msgpack weights + manifest)
that loads and runs WITHOUT the model-construction code.

TPU-native deployment story with no reference counterpart — the reference
serves by reconstructing its Python classes around a torch checkpoint
(`src/eval_prepare_model.py`).  Here the whole prediction program
(past-embedding → S-sample diffusion scan → decode rollout) is captured as
one version-pinned StableHLO module per batch bucket: a serving host needs
jax + the artifact, not the package's model zoo, and the compiled program is
byte-stable across library refactors.

Numerics: on the unfused fp32 path the exported program is bit-exact vs the
live predictor (tests/test_serving.py).  On the TPU fused-bf16 flagship path
the export wrapper traces a marginally different program, so XLA's fusion
(and therefore bf16 rounding) can differ: measured ≤4.9e-4 max deviation in
input space at the bench config (≈0.7 mm metric — same order as the
documented bf16-vs-fp32 decode deviation, docs/bf16_eval_quality.json), and
throughput matches the live bench rate: 322.3 preds/s at batch 256 (vs 324
live bench) and 295 preds/s at batch 64, measured on one v5e.

Artifact layout (a directory):
    predict_b{N}.stablehlo  serialized jax.export module per batch bucket
                            (input = (ae params, diff params, key_data, obs))
    params.msgpack          weights pytree (flax msgpack, numpy leaves)
    manifest.json           shapes, buckets, static config, versions

Variable request sizes: export several buckets (``batch_size=[64, 256]``);
``ServingModel`` routes a request to the smallest bucket ≥ its batch, pads
by repeating the last observation, and slices the pad rows off the result
(static shapes — one compiled program per bucket, never per request).

Weight provenance: on the TPU fused-denoiser path the predictor pre-packs
the denoiser weights at construction (node gathers/pads/casts closed over
by the fused kernels), so those tensors are serialized INTO the StableHLO
as constants — ``params.msgpack`` alone cannot retarget such an artifact to
new denoiser weights.  The manifest records this as
``weights_baked_in_program``; when it is true, re-export after any weight
change (editing ``params.msgpack`` in place would silently mix new AE/cond
weights with the baked denoiser weights).  Unfused exports (CPU, or
``SKELDIFF_FUSED_DENOISER=0``) take every weight from ``params.msgpack``.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

PARAMS_FILE = "params.msgpack"
MANIFEST_FILE = "manifest.json"
_FORMAT_VERSION = 1


def _mlir_file(batch: int) -> str:
    return f"predict_b{batch}.stablehlo"


def export_predictor(
    predictor,
    out_dir: str,
    batch_size: Union[int, Sequence[int]],
    *,
    num_samples: Optional[int] = None,
    pred_length: Optional[int] = None,
    obs_tail_shape: Optional[Tuple[int, ...]] = None,
    platforms: Optional[Sequence[str]] = None,
    mesh=None,
) -> str:
    """Export ``predictor`` (``SkeletonDiffusionPredictor``) to ``out_dir``
    at one or more batch buckets; returns ``out_dir``.

    Each exported function maps ``(key_data [2] uint32, obs [B,T,J,3] input
    space) → pred [B,S,T',J,3] input space``.  ``platforms`` defaults to the
    current backend only — the Pallas fused paths embed TPU-specific custom
    calls that cannot be re-lowered for other platforms after tracing.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``'data'`` axis — the
    program is exported SPMD: batch sharded over 'data', weights replicated,
    XLA's GSPMD partitioner baked into the artifact.  Serving then requires
    the same device count (``ServingModel(path, mesh=...)``) and every batch
    bucket must be divisible by the data-axis size.
    """
    sizes = sorted({int(b) for b in (
        (batch_size,) if isinstance(batch_size, int) else tuple(batch_size)
    )})
    assert sizes and sizes[0] > 0, batch_size
    S = num_samples or predictor.num_samples
    ph = pred_length or predictor.pred_length
    sk = predictor.skeleton
    if obs_tail_shape is None:
        obs_tail_shape = (sk.obs_length, sk.num_nodes, 3)
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
    params_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        (predictor.ae_params, predictor.diff_params),
    )
    from jax import export as jax_export

    mesh_info = None
    if mesh is not None:
        from .parallel import batch_sharding, replicated

        for b in sizes:
            assert b % mesh.shape["data"] == 0, (b, dict(mesh.shape))
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

    os.makedirs(out_dir, exist_ok=True)
    for b in sizes:
        obs_sds = jax.ShapeDtypeStruct((b, *obs_tail_shape), jnp.float32)
        exported = jax_export.export(serve_fn, platforms=list(platforms))(
            params_sds[0], params_sds[1], key_data_sds, obs_sds
        )
        with open(os.path.join(out_dir, _mlir_file(b)), "wb") as f:
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
        "batch_sizes": sizes,
        "num_samples": S,
        "pred_length": ph,
        "obs_tail_shape": list(obs_tail_shape),
        "key_data_shape": list(key_data_sds.shape),
        "fused_denoiser": bool(getattr(predictor, "use_fused_denoiser", False)),
        "fused_decode": bool(getattr(predictor, "use_fused_decode", False)),
        # fused predictors close over pre-packed denoiser weights — those are
        # constants in the exported program; params.msgpack cannot retarget
        # them (see module docstring, "Weight provenance")
        "weights_baked_in_program": bool(getattr(predictor, "use_fused_denoiser", False)),
        "mesh": mesh_info,
    }
    with open(os.path.join(out_dir, MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


class ServingModel:
    """A loaded serving artifact: ``model(rng_key, obs) → pred``.

    Needs only jax (+flax for the msgpack weights) — no model classes, no
    configs, no checkpoint machinery.  Requests of any batch ≤ the largest
    exported bucket are routed to the smallest bucket that fits (pad rows
    repeat the last observation and are sliced off the result).
    """

    def __init__(self, artifact_dir: str, mesh=None):
        from jax import export as jax_export
        import flax.serialization as fs

        with open(os.path.join(artifact_dir, MANIFEST_FILE)) as f:
            self.manifest: Dict = json.load(f)
        if self.manifest.get("format_version") != _FORMAT_VERSION:
            raise ValueError(f"unsupported artifact format: {self.manifest}")
        self.batch_sizes: List[int] = list(self.manifest["batch_sizes"])
        self._exported = {}
        for b in self.batch_sizes:
            with open(os.path.join(artifact_dir, _mlir_file(b)), "rb") as f:
                self._exported[b] = jax_export.deserialize(f.read())
        with open(os.path.join(artifact_dir, PARAMS_FILE), "rb") as f:
            params = fs.msgpack_restore(f.read())
        self._ae_params, self._diff_params = params["ae"], params["diff"]
        mesh_info = self.manifest.get("mesh")
        self._shard_obs = None
        if mesh_info is not None:
            if mesh is None:
                raise ValueError(
                    f"artifact was exported SPMD over {mesh_info['axes']}; "
                    "pass a matching jax.sharding.Mesh"
                )
            if dict(mesh.shape) != mesh_info["axes"]:
                raise ValueError(
                    f"mesh {dict(mesh.shape)} does not match the exported "
                    f"layout {mesh_info['axes']}"
                )
            from .parallel import batch_sharding, replicate

            self._ae_params = replicate(mesh, self._ae_params)
            self._diff_params = replicate(mesh, self._diff_params)
            self._shard_obs = lambda obs: jax.device_put(obs, batch_sharding(mesh))
        elif mesh is not None:
            raise ValueError(
                "artifact was exported single-device; a mesh cannot be applied "
                "at load time — re-export with export_predictor(..., mesh=mesh)"
            )
        # params passed as CALL arguments, not closure constants — closing
        # over them would serialize a copy of every weight into EACH bucket's
        # compiled executable
        self._calls = {
            b: jax.jit(
                lambda ae, diff, key_data, obs, _e=e: _e.call(ae, diff, key_data, obs)
            )
            for b, e in self._exported.items()
        }

    @property
    def batch_size(self) -> int:
        """Largest exported bucket (back-compat accessor)."""
        return self.batch_sizes[-1]

    @property
    def num_samples(self) -> int:
        return self.manifest["num_samples"]

    def __call__(self, rng: jax.Array, obs) -> jax.Array:
        # request-path validation raises (not assert: serving hosts may run
        # python -O, which strips asserts)
        obs = jnp.asarray(obs, jnp.float32)
        tail = tuple(self.manifest["obs_tail_shape"])
        if obs.shape[1:] != tail:
            raise ValueError(f"obs tail {obs.shape[1:]} != exported {tail}")
        B = obs.shape[0]
        if B == 0:
            raise ValueError("empty request: obs batch must be >= 1")
        fits = [b for b in self.batch_sizes if b >= B]
        if not fits:
            raise ValueError(
                f"batch {B} exceeds largest exported bucket {self.batch_size}"
            )
        bucket = fits[0]
        if bucket != B:
            obs = jnp.concatenate(
                [obs, jnp.repeat(obs[-1:], bucket - B, axis=0)], axis=0
            )
        if self._shard_obs is not None:
            obs = self._shard_obs(obs)
        pred = self._calls[bucket](
            self._ae_params, self._diff_params, jax.random.key_data(rng), obs
        )
        return pred[:B] if bucket != B else pred
