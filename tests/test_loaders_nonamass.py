"""Loader tests for the non-AMASS datasets: FreeMan (consuming the SHIPPED
annotation files under ``datasets/annotations/FreeMan/hmp/``), H36M (noS8
mm-GT special-case + segment-csv action renaming, reference `h36m.py:25-33,
91-104`) and zero-shot 3DPW (all-splits merge + 24->22 joint truncation,
reference `amass_zeroshot.py:47-71`)."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from skeletondiffusion_tpu.data import DataLoader
from skeletondiffusion_tpu.data.loaders import (
    FreeManDataset,
    H36MDataset,
    ZeroShotAMASSDataset,
)
from skeletondiffusion_tpu.skeleton import create_skeleton

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FREEMAN_ANN = os.path.join(REPO, "datasets", "annotations", "FreeMan", "hmp")

# FreeMan hmp task geometry (30 fps: 0.5 s obs, 2 s pred)
F_OBS, F_PRED = 15, 60


def _freeman_skeleton():
    return create_skeleton(
        dataset_name="freeman", motion_repr_type="SkeletonRescalePose",
        num_joints=18, pose_box_size=1.5, obs_length=F_OBS, pred_length=F_PRED,
        if_consider_hip=False,
    )


@pytest.fixture(scope="module")
def freeman_npz_dir(tmp_path_factory):
    """Synthetic data_3d_freeman.npz covering every sequence named by the
    SHIPPED segment csvs and the first few of the shipped valid split."""
    root = tmp_path_factory.mktemp("freeman")
    rng = np.random.default_rng(0)
    positions = {}
    df = pd.read_csv(os.path.join(FREEMAN_ANN, "segments_test.csv"))
    for name, need in df.groupby("name")["pred_end"].max().items():
        positions[name] = rng.standard_normal((int(need) + 1, 18, 3)).astype(np.float32) * 0.2
    with open(os.path.join(FREEMAN_ANN, "valid.txt")) as fh:
        valid_seqs = [line.strip() for line in fh]
    for name in valid_seqs:
        if name not in positions:
            positions[name] = rng.standard_normal((160, 18, 3)).astype(np.float32) * 0.2
    np.savez(os.path.join(root, "data_3d_freeman.npz"), positions_3d=positions)
    return str(root)


def test_freeman_test_split_from_shipped_annotations(freeman_npz_dir):
    df = pd.read_csv(os.path.join(FREEMAN_ANN, "segments_test.csv"))
    ds = FreeManDataset(
        split="test", precomputed_folder=freeman_npz_dir, skeleton=_freeman_skeleton(),
        obs_length=F_OBS, pred_length=F_PRED,
        segments_path=os.path.join(FREEMAN_ANN, "segments_test.csv"),
        annotations_folder=FREEMAN_ANN, if_consider_hip=False, silent=True,
    )
    # every row of the shipped csv becomes one evaluation segment
    assert len(ds.segments) == len(df)
    # idx_to_class only names classes of LOADED sequences (insertion order),
    # never labels of other splits -- mean_motion_test.txt lookup contract
    assert set(ds.idx_to_class) == set(ds.seq2action.values())
    assert len(ds.idx_to_class) == len(set(ds.idx_to_class))
    first_seen = list(dict.fromkeys(ds.seq2action[s] for s in ds.dict_indices))
    assert ds.idx_to_class == first_seen
    # action labels come from the shipped seq_actions_labels.txt
    obs, pred, extra = ds[0]
    # __getitem__ returns raw joints; the input-space transform runs on device
    assert obs.shape == (F_OBS, 18, 3) and pred.shape == (F_PRED, 18, 3)
    assert extra["metadata"][0] in ds.class_to_idx
    assert ds.extract_action_label(extra) == extra["metadata"][0]


def test_freeman_valid_split_from_shipped_lists(freeman_npz_dir):
    with open(os.path.join(FREEMAN_ANN, "valid.txt")) as fh:
        valid_seqs = [line.strip() for line in fh]
    ds = FreeManDataset(
        split="valid", precomputed_folder=freeman_npz_dir, skeleton=_freeman_skeleton(),
        obs_length=F_OBS, pred_length=F_PRED, annotations_folder=FREEMAN_ANN,
        if_consider_hip=False, silent=True,
    )
    # all shipped valid sequences are present in the fixture, so all load
    assert set(ds.dict_indices) == set(valid_seqs)
    assert len(ds.segments) > 0
    batch = next(iter(DataLoader(ds, batch_size=4, shuffle=False)))
    assert batch["obs"].shape == (4, F_OBS, 18, 3)
    assert batch["pred"].shape == (4, F_PRED, 18, 3)


# ---------------------------------------------------------------------------
OBS, PRED, J17 = 5, 8, 17


@pytest.fixture(scope="module")
def h36m_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("h36m")
    rng = np.random.default_rng(1)
    positions = {}
    for subject in ("S1", "S8"):
        positions[subject] = {}
        for action in ("Walking_1", "Photo_1"):
            positions[subject][action] = (
                rng.standard_normal((60, J17, 3)).astype(np.float32) * 0.2
            )
    np.savez(os.path.join(root, "data_3d_h36m.npz"), positions_3d=positions)
    return str(root)


def _h36m_skeleton():
    return create_skeleton(
        dataset_name="h36m", motion_repr_type="SkeletonRescalePose", num_joints=J17,
        pose_box_size=1.5, obs_length=OBS, pred_length=PRED, if_consider_hip=False,
    )


def _write_mmgt(path, n_segments):
    with open(path, "w") as fh:
        json.dump(str({i: [i] for i in range(n_segments)}), fh)


def test_h36m_mmgt_noS8_special_case(h36m_fixture):
    sk = _h36m_skeleton()
    common = dict(
        split="train", precomputed_folder=h36m_fixture, skeleton=sk,
        obs_length=OBS, pred_length=PRED, stride=4, if_consider_hip=False, silent=True,
    )
    probe = H36MDataset(subjects=["S1"], **common)
    n = len(probe.segments)
    # distinguishable mm-GT files: with-S8 maps i->[i], noS8 maps i->[0]
    _write_mmgt(os.path.join(h36m_fixture, "mmgt_train.txt"), n)
    with open(os.path.join(h36m_fixture, "mmgt_train_noS8.txt"), "w") as fh:
        json.dump(str({i: [0] for i in range(n)}), fh)

    no_s8 = H36MDataset(subjects=["S1"], if_load_mmgt=True, **common)
    assert all(v == [0] for v in no_s8.mm_indces.values())

    probe8 = H36MDataset(subjects=["S1", "S8"], **common)
    _write_mmgt(os.path.join(h36m_fixture, "mmgt_train.txt"), len(probe8.segments))
    with_s8 = H36MDataset(subjects=["S1", "S8"], if_load_mmgt=True, **common)
    assert all(v == [k] for k, v in with_s8.mm_indces.items())


def test_h36m_segments_csv_action_renaming(h36m_fixture, tmp_path):
    # the reference renames TakingPhoto->Photo / WalkingDog->WalkDog and
    # underscores spaces when reading segment csvs (`h36m.py:94`)
    rows = [
        {"subject": "S1", "action": "TakingPhoto 1", "init": 0, "pred_end": OBS + PRED - 1},
        {"subject": "S8", "action": "Walking 1", "init": 0, "pred_end": OBS + PRED - 1},
    ]
    csv = tmp_path / "segments_test.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    ds = H36MDataset(
        subjects=None, split="test", precomputed_folder=h36m_fixture,
        skeleton=_h36m_skeleton(), obs_length=OBS, pred_length=PRED,
        segments_path=str(csv), if_consider_hip=False, silent=True,
    )
    assert len(ds.segments) == 2
    assert ds.segment_idx_to_metadata[0] == ("S1", "Photo")
    assert ds.segment_idx_to_metadata[1] == ("S8", "Walking")
    # the renamed action resolved to the Photo_1 clip of the fixture
    assert ds.segments[0][0] == ds.dict_indices["S1"]["Photo_1"]


# ---------------------------------------------------------------------------
def test_3dpw_zero_shot_merges_splits_and_truncates_joints(tmp_path):
    rng = np.random.default_rng(2)
    positions = {
        "train": {"seqA": rng.standard_normal((40, 24, 3)).astype(np.float32) * 0.2},
        "validation": {"seqB": rng.standard_normal((40, 24, 3)).astype(np.float32) * 0.2},
        "test": {"seqC": rng.standard_normal((40, 24, 3)).astype(np.float32) * 0.2},
    }
    np.savez(os.path.join(tmp_path, "data_3d_3dpw.npz"), positions_3d=positions)
    # `init` in these csvs is the OBSERVATION start (segment spans obs+pred)
    rows = [
        {"name": name, "init": 0, "pred_end": OBS + PRED - 1}
        for name in ("seqA", "seqB", "seqC")
    ]
    csv = tmp_path / "segments_test.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    sk = create_skeleton(
        dataset_name="3dpw", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=OBS, pred_length=PRED, if_consider_hip=False,
    )
    ds = ZeroShotAMASSDataset(
        split="test", precomputed_folder=str(tmp_path), skeleton=sk,
        obs_length=OBS, pred_length=PRED, segments_path=str(csv),
        if_zero_shot=True, if_consider_hip=False, silent=True,
    )
    # zero-shot test merges ALL splits into one pool
    assert set(ds.dict_indices) == {"seqA", "seqB", "seqC"}
    # 24 SMPL joints truncated to the AMASS-22 skeleton before anything else
    assert all(a.shape[1] == 22 for a in ds.annotations)
    obs, pred, _ = ds[0]
    assert obs.shape == (OBS, 22, 3) and pred.shape == (PRED, 22, 3)
