"""Pin EVERY dataset's kinematic tables against reference-generated goldens.

The goldens (`tests/goldens/skeleton_tables.npz`, produced by
``tests/make_goldens.py`` importing `/root/reference`) hold adjacency,
weighted reachability, node-type ids, limb sequences, left/right flags and
``limb_angles_idx`` for amass(22), amass-mano(52), h36m(17), h36m(25, hip
kept) and freeman(18) — reference
`src/data/skeleton/kinematic/{amass,h36m,freeman}.py`.  One wrong index in
any of these corrupts three of the five evaluation datasets silently, so
each is pinned exact-equal here.
"""
import json
import os

import numpy as np
import pytest

from skeletondiffusion_tpu.skeleton import create_skeleton
from skeletondiffusion_tpu.skeleton.kinematic import H36MKinematic

GOLD = np.load(os.path.join(os.path.dirname(__file__), "goldens", "skeleton_tables.npz"))

CASES = [
    ("amass22", "amass", 22, False),
    ("amass52", "amass-mano", 52, False),
    ("h36m17", "h36m", 17, False),
    ("h36m25", "h36m", 25, True),  # 25-joint variant only exists hip-kept
    ("freeman18", "freeman", 18, False),
]


@pytest.fixture(scope="module", params=CASES, ids=[c[0] for c in CASES])
def case(request):
    name, dataset_name, num_joints, hip = request.param
    sk = create_skeleton(
        dataset_name=dataset_name, motion_repr_type="SkeletonRescalePose",
        num_joints=num_joints, pose_box_size=1.5, obs_length=30,
        pred_length=120, if_consider_hip=hip,
    )
    return name, sk


def test_num_nodes(case):
    name, sk = case
    assert sk.num_nodes == int(GOLD[f"{name}_num_nodes"])


def test_adjacency(case):
    name, sk = case
    np.testing.assert_array_equal(np.asarray(sk.adj_matrix), GOLD[f"{name}_adj"])


def test_reachability(case):
    name, sk = case
    ours = np.asarray(sk.reachability_matrix(factor=0.5, stop_at="hips"), dtype=np.float64)
    np.testing.assert_allclose(ours, GOLD[f"{name}_reach"], atol=0, rtol=0)


def test_node_types(case):
    name, sk = case
    np.testing.assert_array_equal(
        np.asarray(sk.nodes_type_id, dtype=np.int64), GOLD[f"{name}_node_types"]
    )


def test_limbseqs(case):
    name, sk = case
    np.testing.assert_array_equal(
        np.asarray(sk.get_limbseq(), dtype=np.int64), GOLD[f"{name}_limbseq"]
    )
    np.testing.assert_array_equal(
        np.asarray(sk.limbseq, dtype=np.int64), GOLD[f"{name}_metric_limbseq"]
    )


def test_left_right_flags(case):
    name, sk = case
    np.testing.assert_array_equal(
        np.asarray(sk.left_right_limb, dtype=bool), GOLD[f"{name}_left_right"]
    )


def test_limb_angles_idx(case):
    name, sk = case
    expected = json.loads(str(GOLD[f"{name}_limb_angles_idx"]))
    ours = [list(r) for r in getattr(sk, "limb_angles_idx", [])]
    assert ours == expected


def test_h36m_conversion_tables():
    np.testing.assert_array_equal(
        np.asarray(H36MKinematic.CONVERSION_IDX_32TO17, dtype=np.int64),
        GOLD["h36m_conv_32to17"],
    )
    np.testing.assert_array_equal(
        np.asarray(H36MKinematic.CONVERSION_IDX_32TO25, dtype=np.int64),
        GOLD["h36m_conv_32to25"],
    )
