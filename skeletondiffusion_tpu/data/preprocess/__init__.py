"""Offline dataset-creation pipelines (reference `src/data/create_*.py`):
raw mocap archives → ``data_3d_<name>.npz`` + CMD mean motions + mm-GT."""
from .smplh import SMPLHJoints, rodrigues

__all__ = ["SMPLHJoints", "rodrigues"]
