"""Preprocessing subsystem tests: SMPL-H FK math + FreeMan keypoint
conversion, on synthetic model data."""
import numpy as np
import pytest

from skeletondiffusion_tpu.data.preprocess.freeman import preprocess_kpts
from skeletondiffusion_tpu.data.preprocess.smplh import SMPLHJoints, rodrigues


def test_rodrigues_matches_scipy(rng):
    from scipy.spatial.transform import Rotation as R

    aa = rng.standard_normal((10, 3))
    ours = rodrigues(aa)
    ref = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-10)
    # zero rotation → identity
    np.testing.assert_allclose(rodrigues(np.zeros((1, 3)))[0], np.eye(3), atol=1e-9)


def _toy_model(rng, J=5, V=30, B=4):
    kintree = np.zeros((2, J), dtype=np.int64)
    kintree[0] = [0, 0, 1, 2, 2]  # chain-ish tree; entry 0 overwritten to -1
    return {
        "v_template": rng.standard_normal((V, 3)),
        "shapedirs": rng.standard_normal((V, 3, B)) * 0.01,
        "J_regressor": np.abs(rng.standard_normal((J, V))) / V,
        "kintree_table": kintree,
    }


def test_fk_identity_pose_is_rest(rng):
    model = SMPLHJoints(_toy_model(rng))
    betas = rng.standard_normal(4)
    rest = model.rest_joints(betas)
    poses = np.zeros((3, model.num_joints * 3))
    joints = model.forward(poses, betas)
    np.testing.assert_allclose(joints, np.broadcast_to(rest, joints.shape), atol=1e-9)


def test_fk_global_rotation_is_rigid(rng):
    """Root-only rotation must rigidly rotate the whole skeleton about the
    root joint."""
    from scipy.spatial.transform import Rotation as R

    model = SMPLHJoints(_toy_model(rng))
    betas = np.zeros(4)
    rest = model.rest_joints(betas)
    aa = np.array([0.3, -0.2, 0.5])
    poses = np.zeros((1, model.num_joints * 3))
    poses[0, :3] = aa
    joints = model.forward(poses, betas)[0]
    expected = (R.from_rotvec(aa).as_matrix() @ (rest - rest[0]).T).T + rest[0]
    np.testing.assert_allclose(joints, expected, atol=1e-8)
    # bone lengths invariant under any pose
    poses = rng.standard_normal((1, model.num_joints * 3)) * 0.5
    joints = model.forward(poses, betas)[0]
    for j in range(1, model.num_joints):
        p = model.parents[j]
        np.testing.assert_allclose(
            np.linalg.norm(joints[j] - joints[p]),
            np.linalg.norm(rest[j] - rest[p]), atol=1e-8,
        )


def test_fk_translation_and_hand_padding(rng):
    model = SMPLHJoints(_toy_model(rng))
    betas = np.zeros(4)
    trans = rng.standard_normal((2, 3))
    # body-only pose vector (fewer than J joints) → identity-padded
    poses = np.zeros((2, (model.num_joints - 2) * 3))
    joints = model.forward(poses, betas, trans=trans)
    rest = model.rest_joints(betas)
    np.testing.assert_allclose(joints, rest[None] + trans[:, None], atol=1e-9)


def test_freeman_kpts_conversion(rng):
    pos = rng.standard_normal((7, 17, 3)) * 100
    out = preprocess_kpts(pos.copy())
    assert out.shape == (7, 18, 3)
    # root = midpoint of original LHip(11)/RHip(12), in meters with z flipped
    mid = (pos[:, 11] + pos[:, 12]) / 2 / 100
    mid[:, 2] *= -1
    np.testing.assert_allclose(out[:, 0], mid, atol=1e-9)
    nose = pos[:, 0] / 100
    nose[:, 2] *= -1
    np.testing.assert_allclose(out[:, 7], nose, atol=1e-9)


def test_h36m_npz_creation_semantics(tmp_path, rng):
    """create_h36m_npz on pre-extracted .npy files: 32→17 conversion, mm→m,
    action canonicalization (reference `create_h36m_dataset.py` naming),
    and the corrupted S11/Directions skip."""
    from skeletondiffusion_tpu.data.preprocess.h36m import create_h36m_npz
    from skeletondiffusion_tpu.skeleton.kinematic import H36MKinematic

    clips = {
        ("S9", "WalkingDog 1"): rng.normal(size=(7, 32, 3)) * 1000,
        ("S9", "TakingPhoto"): rng.normal(size=(5, 32, 3)) * 1000,
        ("S11", "Directions"): rng.normal(size=(6, 32, 3)) * 1000,  # skipped
        ("S11", "Eating"): rng.normal(size=(4, 32, 3)) * 1000,
    }
    for (subj, action), arr in clips.items():
        d = tmp_path / subj / "MyPoseFeatures" / "D3_Positions"
        d.mkdir(parents=True, exist_ok=True)
        np.save(str(d / f"{action}.npy"), arr.astype(np.float64))

    out = str(tmp_path / "data_3d_h36m.npz")
    result = create_h36m_npz(str(tmp_path), out, num_joints=17)

    assert set(result) == {"S9", "S11"}
    assert set(result["S9"]) == {"WalkDog_1", "Photo"}          # canonical names
    assert set(result["S11"]) == {"Eating"}                      # Directions skipped
    conv = H36MKinematic.CONVERSION_IDX_32TO17
    want = (clips[("S9", "WalkingDog 1")][:, conv, :] / 1000.0).astype(np.float32)
    np.testing.assert_allclose(result["S9"]["WalkDog_1"], want, rtol=1e-6)
    # written file round-trips through the loader-side format
    stored = np.load(out, allow_pickle=True)["positions_3d"].item()
    np.testing.assert_array_equal(stored["S9"]["WalkDog_1"], result["S9"]["WalkDog_1"])


def test_freeman_slice_naming_matches_reference(tmp_path, rng):
    """npz key naming for ill-posed slices ≡ reference
    `create_freeman_dataset.py:91-103`: plain name for a single (even
    trimmed) slice, 1-BASED `_slice{i}` suffix for multi-slice, unlabeled
    multi-slice sequences dropped — the shipped annotation/split files
    reference exactly these names."""
    import json
    import os

    from skeletondiffusion_tpu.data.preprocess.freeman import create_freeman_npz

    root = tmp_path / "freeman"
    (root / "keypoints3d").mkdir(parents=True)
    ann = tmp_path / "ann"
    ann.mkdir()
    T = 40
    for seq in ("seqA", "seqB", "seqC", "seqD"):
        np.save(root / "keypoints3d" / f"{seq}.npy",
                rng.standard_normal((1, T, 17, 3)).astype(np.float32))
    (root / "ignore_list.txt").write_text("")
    illposed = {"seqB": [[5, 30]],              # single trimmed slice
                "seqC": [[0, 12], [20, 40]],    # two slices, labeled
                "seqD": [[0, 10], [15, 25]]}    # two slices, UNLABELED
    with open(ann / "illlposed_slices_idxs.json", "w") as f:
        json.dump(str(illposed), f)
    (ann / "seq_actions_labels.txt").write_text(
        "seqA,walk\nseqB,jump\nseqC_slice1,run\nseqC_slice2,run\n"
    )
    out = create_freeman_npz(str(root), str(ann), str(tmp_path / "data_3d_freeman.npz"))
    assert set(out.keys()) == {"seqA", "seqB", "seqC_slice1", "seqC_slice2"}, out.keys()
    assert out["seqB"].shape[0] == 25          # trimmed but plain-named
    assert out["seqC_slice1"].shape[0] == 12
    assert out["seqC_slice2"].shape[0] == 20
