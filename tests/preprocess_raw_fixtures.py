"""Deterministic synthetic RAW inputs for the preprocessing
cross-implementation goldens (VERDICT r3 next-round #4).

Both ``make_preprocess_golden.py`` (which drives the REFERENCE's own
``create_h36m_dataset.py`` / ``create_freeman_dataset.py`` on these inputs)
and ``test_preprocess_golden.py`` (which drives OUR
``data/preprocess/{h36m,freeman}.py`` on the same inputs) import this module,
so the two implementations see bit-identical raw data without shipping the
raw arrays inside the golden file.

The fixtures deliberately cover the semantic edge cases:
H36M — the S11/Directions corrupted-video skip, TakingPhoto→Photo /
WalkingDog→WalkDog / space→underscore canonicalization, mm→m scaling, the
32→17 and 32→25 conversion tables; FreeMan — keypoint-variant priority
(smoothnet32 > smoothnet > optim), ignore-list and bad-sequences skips,
curated ill-posed slicing (single trimmed slice keeps the plain name,
multi-slice gets 1-based ``_slice{i}`` suffixes, multi-slice of unlabeled
sequences is dropped), COCO→hip-rooted joint reorder, synthetic pelvis,
cm→m, axis flip.
"""
from __future__ import annotations

import json
import os

import numpy as np

# ---------------------------------------------------------------------------
# Human3.6M
# ---------------------------------------------------------------------------

H36M_SUBJECTS = ["S1", "S11"]
H36M_FRAMES = 12

# 30 actions per subject (the reference asserts exactly 30 .cdf files per
# subject, `create_h36m_dataset.py:33`); includes every canonicalization case
H36M_ACTIONS = (
    ["Directions", "Directions 1", "TakingPhoto", "TakingPhoto 1",
     "WalkingDog", "WalkingDog 1", "Walking 1", "Walking 2",
     "Eating", "Eating 2", "Smoking", "Smoking 1",
     "Discussion 1", "Discussion 2", "Greeting", "Greeting 1",
     "Phoning", "Phoning 1", "Sitting 1", "Sitting 2",
     "SittingDown", "SittingDown 2", "Waiting 1", "Waiting 2",
     "WalkTogether 1", "WalkTogether 2", "Purchases", "Purchases 1"]
    + [f"Posing {i}" for i in range(1, 3)]
)
assert len(H36M_ACTIONS) == 30


def h36m_raw():
    """{subject: {action: [T, 32, 3] float64 mm}} — what a CDF 'Pose'
    variable reshapes to."""
    rng = np.random.default_rng(4242)
    return {
        subj: {
            act: rng.standard_normal((H36M_FRAMES, 32, 3)) * 200.0 + 800.0
            for act in H36M_ACTIONS
        }
        for subj in H36M_SUBJECTS
    }


def write_h36m_tree(root: str, raw, ext: str):
    """Lay out <root>/<subject>/MyPoseFeatures/D3_Positions/<action>.<ext>.
    ``ext='cdf'`` writes npy-format blobs under .cdf names (read back by the
    golden maker's cdflib stub); ``ext='npy'`` is the fallback format our
    CLI accepts without cdflib."""
    for subj, actions in raw.items():
        base = os.path.join(root, subj, "MyPoseFeatures", "D3_Positions")
        os.makedirs(base, exist_ok=True)
        for act, arr in actions.items():
            with open(os.path.join(base, f"{act}.{ext}"), "wb") as fh:
                np.save(fh, arr)


# ---------------------------------------------------------------------------
# FreeMan
# ---------------------------------------------------------------------------

FREEMAN_FRAMES = 80


def freeman_raw():
    """Returns (variants, illposed, labels, ignore, bad):
    ``variants``: {seq: {variant_key: [T, 17, 3] float64 cm}} — the upstream
    object-dict npy payloads."""
    rng = np.random.default_rng(1717)

    def kpts():
        return rng.standard_normal((FREEMAN_FRAMES, 17, 3)) * 30.0 + 100.0

    variants = {
        # untouched, lowest-priority variant only
        "20220801_aa1_subj01": {"keypoints3d_optim": kpts()},
        # variant priority: smoothnet32 must win over optim
        "20220802_bb2_subj02": {"keypoints3d_optim": kpts(),
                                "keypoints3d_smoothnet32": kpts()},
        # middle priority + single trimmed ill-posed slice → plain name
        "20220803_cc3_subj03": {"keypoints3d_smoothnet": kpts()},
        # two ill-posed slices, labeled → _slice1/_slice2
        "20220804_dd4_subj04": {"keypoints3d_optim": kpts()},
        # two ill-posed slices, NOT labeled → dropped entirely
        "20220805_ee5_subj05": {"keypoints3d_optim": kpts()},
        # on the ignore list → skipped
        "20220806_ff6_subj06": {"keypoints3d_optim": kpts()},
        # in bad_sequences.json → skipped
        "20220807_gg7_subj07": {"keypoints3d_optim": kpts()},
    }
    illposed = {
        "20220803_cc3_subj03": [[5, 45]],
        "20220804_dd4_subj04": [[0, 30], [40, 70]],
        "20220805_ee5_subj05": [[0, 20], [30, 60]],
    }
    labels = {
        "20220801_aa1_subj01": "walk",
        "20220802_bb2_subj02": "jump",
        "20220803_cc3_subj03": "drink",
        "20220804_dd4_subj04": "dance",
        # 20220805 deliberately unlabeled
        "20220806_ff6_subj06": "walk",
        "20220807_gg7_subj07": "walk",
    }
    ignore = ["20220806_ff6_subj06"]
    bad = ["20220807_gg7_subj07"]
    return variants, illposed, labels, ignore, bad


def write_freeman_tree(dataset_folder: str, annotation_folder: str):
    """Lay out the raw FreeMan tree exactly as the reference expects
    (`create_freeman_dataset.py:57-80`)."""
    variants, illposed, labels, ignore, bad = freeman_raw()
    kdir = os.path.join(dataset_folder, "keypoints3d")
    os.makedirs(kdir, exist_ok=True)
    os.makedirs(annotation_folder, exist_ok=True)
    for seq, d in variants.items():
        payload = np.empty(1, dtype=object)
        payload[0] = d
        with open(os.path.join(kdir, seq + ".npy"), "wb") as fh:
            np.save(fh, payload)
    with open(os.path.join(dataset_folder, "ignore_list.txt"), "w") as f:
        f.writelines(s + "\n" for s in ignore)
    with open(os.path.join(annotation_folder, "bad_sequences.json"), "w") as f:
        json.dump(bad, f)
    # the reference does ast.literal_eval(json.load(...)): the json payload
    # is a STRING holding a python dict repr
    with open(os.path.join(annotation_folder, "illlposed_slices_idxs.json"), "w") as f:
        json.dump(str(illposed), f)
    with open(os.path.join(annotation_folder, "seq_actions_labels.txt"), "w") as f:
        f.writelines(f"{k},{v}\n" for k, v in labels.items())
    return variants, illposed, labels
