"""Skeleton domain model: kinematics × motion representation.

``create_skeleton(**cfg)`` dynamically composes a per-dataset kinematic class
with a motion-representation class, mirroring the reference factory
(`src/data/skeleton/__init__.py:5-37`) — e.g.
``create_skeleton(dataset_name='amass', motion_repr_type='SkeletonRescalePose',
num_joints=22, pose_box_size=1.5, obs_length=30, pred_length=120)`` yields an
``AMASSSkeletonRescalePose`` instance.
"""
from .graph import get_adj_matrix, reachability_matrix, parents_from_limbseq
from .kinematic import (
    AMASSKinematic,
    FreeManKinematic,
    H36MKinematic,
    Kinematic,
    get_kinematic_class,
)
from .motion import (
    MotionRepresentation,
    SkeletonCenterPose,
    SkeletonDiscreteCosineTransform,
    SkeletonRescalePose,
    center_kpts_around_hip,
    get_motion_representation_class,
)

__all__ = [
    "AMASSKinematic", "FreeManKinematic", "H36MKinematic", "Kinematic",
    "MotionRepresentation", "SkeletonCenterPose", "SkeletonRescalePose",
    "SkeletonDiscreteCosineTransform", "center_kpts_around_hip",
    "create_skeleton", "get_adj_matrix", "get_skeleton_class",
    "get_kinematic_class", "get_motion_representation_class",
    "parents_from_limbseq", "reachability_matrix",
]


def get_skeleton_class(**kwargs):
    """Compose kinematic + motion-representation classes; reference
    `src/data/skeleton/__init__.py:5-32`."""
    motion_cls = get_motion_representation_class(kwargs["motion_repr_type"])
    kin_cls, dataset_type = get_kinematic_class(kwargs["dataset_name"])
    name = dataset_type + kwargs["motion_repr_type"]

    def _init(self, *args, **kw):
        kin_cls.__init__(self, *args, **kw)
        motion_cls.__init__(self, *args, **kw)

    return type(name, (kin_cls, motion_cls), {"__init__": _init})


def create_skeleton(**kwargs):
    """Reference `src/data/skeleton/__init__.py:34-37`."""
    return get_skeleton_class(**kwargs)(**kwargs)
