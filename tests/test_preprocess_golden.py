"""Preprocessing cross-implementation parity: OUR
``data/preprocess/{h36m,freeman}.py`` vs goldens produced by the REFERENCE's
own ``create_h36m_dataset.py`` / ``create_freeman_dataset.py`` on identical
synthetic raw trees (``make_preprocess_golden.py``; VERDICT r3 #4).

Covers, cross-implementation: the S11/Directions corrupted-video skip, the
action canonicalizations, mm→m, both 32→17 and 32→25 conversion tables;
FreeMan variant priority, ignore/bad-sequence skips, ill-posed slicing and
slice naming, unlabeled-multi-slice dropping, the COCO→hip-rooted reorder +
synthetic pelvis + cm→m + axis flip.  The SMPL-H FK path (AMASS/3DPW) stays
property-tested only — genuinely blocked on body-model artifacts (PARITY.md).
"""
import os

import numpy as np
import pytest

from preprocess_raw_fixtures import h36m_raw, write_freeman_tree, write_h36m_tree

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "preprocess.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLD)


@pytest.mark.parametrize("num_joints", [17, 25])
def test_h36m_preprocess_matches_reference(tmp_path, golden, num_joints):
    from skeletondiffusion_tpu.data.preprocess.h36m import create_h36m_npz

    raw_tree = tmp_path / "h36m_raw"
    write_h36m_tree(str(raw_tree), h36m_raw(), ext="npy")
    out = create_h36m_npz(
        str(raw_tree), str(tmp_path / f"data_3d_h36m_{num_joints}.npz"),
        num_joints=num_joints,
    )
    ours = {f"{s}|{a}": arr for s, acts in out.items() for a, arr in acts.items()}
    prefix = f"h36m{num_joints}|"
    ref = {k[len(prefix):]: golden[k] for k in golden.files if k.startswith(prefix)}
    assert set(ours) == set(ref)
    for k in ref:
        assert ours[k].dtype == np.float32
        np.testing.assert_array_equal(ours[k], ref[k], err_msg=k)


def test_freeman_preprocess_matches_reference(tmp_path, golden):
    from skeletondiffusion_tpu.data.preprocess.freeman import create_freeman_npz

    ds_dir = tmp_path / "freeman_raw"
    ann_dir = tmp_path / "freeman_ann"
    write_freeman_tree(str(ds_dir), str(ann_dir))
    out = create_freeman_npz(
        str(ds_dir), str(ann_dir), str(tmp_path / "data_3d_freeman.npz")
    )
    ref = {k[len("freeman|"):]: golden[k] for k in golden.files if k.startswith("freeman|")}
    assert set(out) == set(ref)
    for k in ref:
        assert out[k].dtype == np.float32
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
