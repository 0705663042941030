"""Motion representations: pure, jittable input-space ↔ metric-space
transforms (the L3 motion-representation half of the skeleton domain model).

Mirrors the reference's class hierarchy (`src/data/skeleton/motion/{base,
centerpose,rescalepose,dct}.py`) as mixin classes whose transform methods are
pure jnp functions of statically-configured objects, so any method can sit
inside a jitted program (the eval pipeline applies
``transform_to_metric_space`` on device to the full [B,S,T,J,3] sample
tensor).
"""
from __future__ import annotations

import math
import jax.numpy as jnp
import numpy as np

from .kinematic import NODE_HIP


def center_kpts_around_hip(kpts: jnp.ndarray, hip_idx: int = 0):
    """Center all keypoints on the hip joint; reference
    `src/data/skeleton/motion/utils.py:1-7`.  Returns (centered, center)."""
    center = kpts[..., hip_idx : hip_idx + 1, :]
    return kpts - center, center


class MotionRepresentation:
    """Base ("Vanilla") representation; reference `motion/base.py:4-96`.

    Data layout: ``[..., T, J, 3]`` with the global root (hip) at joint 0 in
    metric space.  With ``if_consider_hip=False`` (the hmp task default,
    `configs/config_eval/task/hmp.yaml:4`) the input space drops the root and
    works on ``J-1`` nodes.
    """

    node_hip = NODE_HIP

    def __init__(
        self,
        if_consider_hip: bool = False,
        obs_length: int = 30,
        pred_length: int = 120,
        seq_centering: int = 0,
        **kwargs,
    ):
        self.if_consider_hip = if_consider_hip
        self.obs_length = obs_length
        self.pred_length = pred_length
        self.seq_centering = seq_centering
        # negative values index back from the end of the OBSERVATION window
        # (see _get_where_is_seq_centered); bound both directions — the old
        # `< 0 or` form accepted any negative, silently centering on a
        # future frame via Python wrap-around for out-of-range values
        assert -obs_length <= seq_centering < obs_length + pred_length, seq_centering

    # ---- input space -----------------------------------------------------
    def _get_where_is_seq_centered(self) -> int:
        if self.seq_centering < 0:
            return self.obs_length + self.seq_centering
        return self.seq_centering

    def transform_hip_to_input_space(self, data: jnp.ndarray) -> jnp.ndarray:
        """Shift the hip trajectory so frame ``seq_centering`` is the origin;
        reference `motion/base.py:21-33`."""
        centered, hips = data[..., 1:, :], data[..., 0:1, :]
        t0 = self._get_where_is_seq_centered()
        hips = hips - hips[..., t0, :, :][..., None, :, :]
        return jnp.concatenate([hips, centered], axis=-2)

    def tranform_to_input_space(self, data: jnp.ndarray) -> jnp.ndarray:
        """Metric space [..., T, J, 3] → model input space (reference
        `motion/base.py:35-42`; the reference's spelling is kept for API
        parity).  Drops the root joint unless ``if_consider_hip``."""
        data = self.tranform_to_input_space_pose_only(data)
        if not self.if_consider_hip:
            return data[..., 1:, :]
        return self.transform_hip_to_input_space(data)

    def tranform_to_input_space_pose_only(self, data: jnp.ndarray) -> jnp.ndarray:
        return data

    # ---- zero-pad helpers --------------------------------------------------
    def add_zero_pad_center_hip(self, kpts: jnp.ndarray) -> jnp.ndarray:
        """Re-insert a zero root joint at index 0; reference
        `motion/base.py:48-52`."""
        shape = list(kpts.shape)
        shape[-2] = 1
        return jnp.concatenate([jnp.zeros(shape, dtype=kpts.dtype), kpts], axis=-2)

    def if_add_zero_pad_center_hip(self, kpts: jnp.ndarray) -> jnp.ndarray:
        if not self.if_consider_hip and kpts.shape[-2] == self.num_joints - 1:
            kpts = self.add_zero_pad_center_hip(kpts)
        return kpts

    # ---- metric space ------------------------------------------------------
    def transform_hip_to_metric_space(self, kpts: jnp.ndarray) -> jnp.ndarray:
        return kpts

    def _merge_hip_and_poseinmetricspace(self, hip_coords, kpts):
        return jnp.concatenate([hip_coords, kpts], axis=-2)

    def transform_to_metric_space(self, kpts: jnp.ndarray) -> jnp.ndarray:
        """Model space → 3D metric coordinates; reference
        `motion/base.py:69-86`."""
        if self.if_consider_hip:
            kpts = self.transform_hip_to_metric_space(kpts)
            hip_coords = kpts[..., :1, :]
            pose = self.transform_to_metric_space_pose_only(kpts[..., 1:, :])
            return self._merge_hip_and_poseinmetricspace(hip_coords, pose)
        return self.transform_to_metric_space_pose_only(kpts)

    def transform_to_metric_space_pose_only(self, kpts: jnp.ndarray) -> jnp.ndarray:
        return kpts


class SkeletonCenterPose(MotionRepresentation):
    """Center the pose around the hip, keep the hip trajectory; reference
    `motion/centerpose.py:6-23`."""

    def tranform_to_input_space_pose_only(self, data: jnp.ndarray) -> jnp.ndarray:
        centered, hips = center_kpts_around_hip(data, hip_idx=0)
        return jnp.concatenate([hips, centered[..., len(self.node_hip):, :]], axis=-2)

    def _merge_hip_and_poseinmetricspace(self, hip_coords, kpts):
        return super()._merge_hip_and_poseinmetricspace(hip_coords, kpts + hip_coords)


class SkeletonRescalePose(SkeletonCenterPose):
    """CenterPose + rescale into a unit box of half-side ``pose_box_size``
    (1.5 m for training configs, `config_train_autoencoder/task/hmp.yaml:9`);
    reference `motion/rescalepose.py:6-39`.  This is the representation used
    by every published checkpoint (`eval.py:135`)."""

    def __init__(self, pose_box_size: float = 1.1, **kwargs):
        super().__init__(**kwargs)
        self.pose_box_size = float(pose_box_size)

    def tranform_to_input_space_pose_only(self, data: jnp.ndarray) -> jnp.ndarray:
        centered, hips = center_kpts_around_hip(data, hip_idx=0)
        centered = centered / self.pose_box_size
        return jnp.concatenate([hips, centered[..., 1:, :]], axis=-2)

    def transform_to_metric_space_pose_only(self, kpts: jnp.ndarray) -> jnp.ndarray:
        return kpts * self.pose_box_size


def get_dct_matrix(N: int) -> tuple[np.ndarray, np.ndarray]:
    """Orthonormal DCT-II matrix and its inverse (transpose); host-side
    precompute mirroring reference `motion/dct.py`."""
    dct_m = np.zeros((N, N), dtype=np.float64)
    for k in range(N):
        for i in range(N):
            w = math.sqrt(2.0 / N)
            if k == 0:
                w = math.sqrt(1.0 / N)
            dct_m[k, i] = w * math.cos(math.pi * (i + 0.5) * k / N)
    idct_m = np.linalg.inv(dct_m)
    return dct_m, idct_m


class SkeletonDiscreteCosineTransform(SkeletonCenterPose):
    """Frequency-space representation over the time axis (unused by the
    default configs); reference `motion/dct.py:39-80`: CenterPose → DCT-II of
    the observed/future segments; inverse DCT back to metric space."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        dct_fut, idct_fut = get_dct_matrix(self.pred_length)
        dct_past, idct_past = get_dct_matrix(self.obs_length)
        self.dct_m_fut = jnp.asarray(dct_fut, jnp.float32)
        self.idct_m_fut = jnp.asarray(idct_fut, jnp.float32)
        self.dct_m_past = jnp.asarray(dct_past, jnp.float32)
        self.idct_m_past = jnp.asarray(idct_past, jnp.float32)

    @staticmethod
    def _apply(m: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("dn,...ncf->...dcf", m, data)

    def tranform_to_input_space_pose_only(self, data: jnp.ndarray) -> jnp.ndarray:
        """Reference `dct.py:50-59`: per-segment DCT after centering."""
        data = super().tranform_to_input_space_pose_only(data)
        if data.shape[-3] == self.pred_length:
            return self._apply(self.dct_m_fut, data)
        obs = data[..., : self.obs_length, :, :]
        fut = data[..., self.obs_length :, :, :]
        return jnp.concatenate(
            [self._apply(self.dct_m_past, obs), self._apply(self.dct_m_fut, fut)], axis=-3
        )

    def transform_to_metric_space_pose_only(self, kpts: jnp.ndarray) -> jnp.ndarray:
        """Reference `dct.py:75-80`."""
        assert kpts.shape[-3] in (self.pred_length, self.obs_length)
        idct = self.idct_m_fut if kpts.shape[-3] == self.pred_length else self.idct_m_past
        return self._apply(idct, kpts)


def get_motion_representation_class(motion_repr_type: str):
    """Reference `motion/__init__.py:8-9`."""
    mapping = {
        "SkeletonVanilla": MotionRepresentation,
        "SkeletonCenterPose": SkeletonCenterPose,
        "SkeletonRescalePose": SkeletonRescalePose,
        "SkeletonDiscreteCosineTransform": SkeletonDiscreteCosineTransform,
    }
    return mapping[motion_repr_type]
