"""Per-dataset loaders (L4): AMASS, AMASS-MANO, Human3.6M, FreeMan, and the
zero-shot 3DPW variant; reference `src/data/loaders/{amass,h36m,freeman,
amass_zeroshot}.py`.

All read a single ``data_3d_<name>.npz`` with a ``positions_3d`` dict of
clips [T, J, 3] plus optional ``segments_*.csv`` test-split definitions.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .dataset import MotionDataset


class AMASSDataset(MotionDataset):
    """Reference `amass.py:13-104` (22-joint body; 52 with MANO hands)."""

    def __init__(self, datasets, *args, file_idces="all", if_long_term_test=False,
                 long_term_factor=4, **kwargs):
        self.datasets, self.file_idces = datasets, file_idces
        assert file_idces == "all"
        self.FPS = 60
        self.dict_indices = {}
        self.metadata_class_idx = 0  # dataset name is the CMD class
        self.idx_to_class = ["DFaust", "DanceDB", "GRAB", "HUMAN4D", "SOMA", "SSM", "Transitions"]
        self.class_to_idx = {v: k for k, v in enumerate(self.idx_to_class)}
        self.if_long_term_test = if_long_term_test
        self.long_term_factor = long_term_factor
        if if_long_term_test:
            kwargs["pred_length"] = int(kwargs["pred_length"] * long_term_factor)
        super().__init__(*args, datasets=datasets, **kwargs)

    def _prepare_data(self):
        if self.segments_path:
            self.segments, self.segment_idx_to_metadata = self._load_annotations_and_segments(
                self.segments_path
            )
            self.stride = 1
            self.augmentation = 0
        else:
            self.annotations = self._read_all_annotations(self.datasets, self.file_idces)
            self.segments, self.segment_idx_to_metadata = self._generate_segments()

    def _read_all_annotations(self, datasets, file_idces) -> List[np.ndarray]:
        path = os.path.join(self.precomputed_folder, "data_3d_amass.npz")
        data_o = np.load(path, allow_pickle=True)["positions_3d"].item()
        anns_all = []
        self.dict_indices = {}
        self.clip_idx_to_metadata = []
        counter = 0
        for dataset in datasets:
            self.dict_indices[dataset] = {}
            for file_idx in list(data_o[dataset].keys()):
                seq = data_o[dataset][file_idx]
                self.dict_indices[dataset][file_idx] = counter
                self.clip_idx_to_metadata.append((dataset, str(file_idx)))
                counter += 1
                anns_all.append(seq.astype(self.dtype))
        return anns_all

    def _load_annotations_and_segments(self, segments_path):
        """Test split from csv: (dataset,file,file_idx,pred_init,pred_end);
        reference `amass.py:88-104`."""
        import pandas as pd

        assert os.path.exists(segments_path), segments_path
        df = pd.read_csv(segments_path)
        datasets = list(df["dataset"].unique())
        self.annotations = self._read_all_annotations(datasets, "all")
        segments = [
            (self.dict_indices[row["dataset"]][row["file_idx"]],
             row["pred_init"] - self.obs_length,
             row["pred_init"] + self.pred_length - 1)
            for _, row in df.iterrows()
        ]
        seg2meta = [(row["dataset"], str(row["file_idx"])) for _, row in df.iterrows()]
        return segments, seg2meta


class H36MDataset(MotionDataset):
    """Reference `h36m.py:8-120` (17-joint default)."""

    def __init__(self, subjects, *args, actions="all", **kwargs):
        self.subjects, self.actions = subjects, actions
        self.FPS = 50
        self.dict_indices = {}
        self.metadata_class_idx = 1  # action is the CMD class
        self.idx_to_class = [
            "Directions", "Discussion", "Eating", "Greeting", "Phoning", "Posing",
            "Purchases", "Sitting", "SittingDown", "Smoking", "Photo", "Waiting",
            "Walking", "WalkDog", "WalkTogether",
        ]
        self.class_to_idx = {v: k for k, v in enumerate(self.idx_to_class)}
        super().__init__(*args, actions=actions, **kwargs)

    def load_mmgt(self, path: Optional[str] = None):
        """Training mm-GT special-cases the no-S8 subject list; reference
        `h36m.py:25-33`."""
        if not self.if_load_mmgt:
            return
        if self.split == "train":
            name = "mmgt_train.txt" if "S8" in self.subjects else "mmgt_train_noS8.txt"
            super().load_mmgt(os.path.join(self.precomputed_folder, name))
        else:
            super().load_mmgt(path)

    def _prepare_data(self):
        if self.segments_path:
            self.segments, self.segment_idx_to_metadata = self._load_annotations_and_segments(
                self.segments_path
            )
            self.stride = 1
            self.augmentation = 0
        else:
            self.annotations = self._read_all_annotations(self.subjects, self.actions)
            self.segments, self.segment_idx_to_metadata = self._generate_segments()

    def _read_all_annotations(self, subjects, actions):
        path = os.path.join(self.precomputed_folder, "data_3d_h36m.npz")
        data_o = np.load(path, allow_pickle=True)["positions_3d"].item()
        data_f = {s: v for s, v in data_o.items() if s in subjects}
        if actions != "all":
            for subject in list(data_f.keys()):
                data_f[subject] = {
                    k: v for k, v in data_f[subject].items() if any(a in k for a in actions)
                }
                if not data_f[subject]:
                    data_f.pop(subject)
        anns_all = []
        self.dict_indices = {}
        self.clip_idx_to_metadata = []
        counter = 0
        for subject in data_f:
            self.dict_indices[subject] = {}
            for action in data_f[subject]:
                self.dict_indices[subject][action] = counter
                self.clip_idx_to_metadata.append((subject, action.split(" ")[0].split("_")[0]))
                counter += 1
                anns_all.append(data_f[subject][action].astype(self.dtype))
        return anns_all

    def _load_annotations_and_segments(self, segments_path):
        import pandas as pd

        df = pd.read_csv(segments_path)
        df["action"] = df["action"].apply(
            lambda x: x.replace("TakingPhoto", "Photo").replace("WalkingDog", "WalkDog").replace(" ", "_")
        )
        subjects, actions = list(df["subject"].unique()), list(df["action"].unique())
        self.annotations = self._read_all_annotations(subjects, actions)
        segments = [
            (self.dict_indices[row["subject"]][row["action"]], int(row["init"]), int(row["pred_end"]))
            for _, row in df.iterrows()
        ]
        seg2meta = [
            (row["subject"], row["action"].split(" ")[0].split("_")[0]) for _, row in df.iterrows()
        ]
        return segments, seg2meta


class FreeManDataset(MotionDataset):
    """Reference `freeman.py:9-120` (18 joints, 30 fps, action labels from a
    curated file)."""

    def __init__(self, *args, actions="all", annotations_folder=None, **kwargs):
        self.annotations_folder = annotations_folder
        self.FPS = 30
        self.actions = actions
        self.dict_indices = {}
        self.metadata_class_idx = 0
        super().__init__(*args, actions=actions, **kwargs)

    def extract_action_label(self, extra):
        return extra["metadata"][0]

    def _file2action(self):
        file2action = {}
        with open(os.path.join(self.annotations_folder, "seq_actions_labels.txt")) as f:
            for line in f:
                name, action = line.strip().split(",")
                file2action[name] = action
        return file2action

    def _prepare_data(self):
        if self.segments_path:
            self.segments, self.segment_idx_to_metadata = self._load_annotations_and_segments(
                self.segments_path
            )
            self.stride = 1
            self.augmentation = 0
        else:
            with open(os.path.join(self.annotations_folder, f"{self.split}.txt")) as f:
                split_seqs = [line.strip() for line in f]
            self.annotations = self._read_all_annotations(self.actions, split_seqs)
            self.segments, self.segment_idx_to_metadata = self._generate_segments()

    def _read_all_annotations(self, actions, seqs):
        path = os.path.join(self.precomputed_folder, "data_3d_freeman.npz")
        data_o = np.load(path, allow_pickle=True)["positions_3d"].item()
        # fail loudly on split-file sequences missing from the npz (reference
        # `freeman.py:56` KeyErrors): silently dropping them would shrink the
        # split and mask data-preparation errors
        missing = [key for key in seqs if key not in data_o]
        if missing:
            raise KeyError(
                f"{len(missing)} sequences from the {self.split}.txt split file "
                f"are missing from data_3d_freeman.npz (first: {missing[:5]}); "
                "re-run the FreeMan preprocessing"
            )
        data_f = {key: data_o[key] for key in seqs}
        # labels restricted to the LOADED sequences, classes in insertion
        # order (reference `freeman.py:58-79`): idx_to_class must only name
        # classes present in this split or the mean_motion_test.txt lookup
        # (dataset.py::_load_mean_motion) KeyErrors on the real data
        file2action = {k: v for k, v in self._file2action().items() if k in data_f}
        if actions != "all":
            assert isinstance(actions, list)
            file2action = {k: v for k, v in file2action.items() if v in actions}
            data_f = {k: v for k, v in data_f.items() if k in file2action}
        else:
            # every loaded sequence must have an action label (the reference
            # indexes seq2action unconditionally, `freeman.py:83-85`); fail
            # with the offending names instead of a bare KeyError below
            unlabeled = [k for k in data_f if k not in file2action]
            if unlabeled:
                raise ValueError(
                    f"{len(unlabeled)} FreeMan sequence(s) in the split have no "
                    f"row in seq_actions_labels.txt: {unlabeled[:5]}..."
                )
        self.seq2action = file2action
        self.idx_to_class = list(dict.fromkeys(file2action.values()))
        self.class_to_idx = {v: k for k, v in enumerate(self.idx_to_class)}
        anns_all = []
        self.dict_indices = {}
        self.clip_idx_to_metadata = []
        counter = 0
        for seq_name, seq in data_f.items():
            self.dict_indices[seq_name] = counter
            self.clip_idx_to_metadata.append((file2action[seq_name], seq_name))
            counter += 1
            anns_all.append(seq.astype(self.dtype))
        return anns_all

    def _load_annotations_and_segments(self, segments_path):
        import pandas as pd

        df = pd.read_csv(segments_path)
        seqs = list(df["name"].unique())
        self.annotations = self._read_all_annotations(self.actions, seqs)
        segments = [
            (self.dict_indices[row["name"]], int(row["init"]), int(row["pred_end"]))
            for _, row in df.iterrows()
        ]
        seg2meta = [
            (self.seq2action[row["name"]], row["name"]) for _, row in df.iterrows()
        ]
        return segments, seg2meta


class ZeroShotAMASSDataset(MotionDataset):
    """Zero-shot evaluation on an unseen capture setup; merges all splits
    and truncates to the AMASS 22-joint body; reference
    `amass_zeroshot.py:9-104`."""

    dataset_name = "3dpw"

    def __init__(self, *args, annotations_folder=None, if_zero_shot=True, **kwargs):
        self.annotations_folder = annotations_folder
        self.FPS = 60
        self.if_zero_shot = if_zero_shot
        self.dict_indices = {}
        self.metadata_class_idx = 0
        super().__init__(*args, **kwargs)

    def _prepare_data(self):
        if self.segments_path:
            self.segments, self.segment_idx_to_metadata = self._load_annotations_and_segments(
                self.segments_path
            )
            self.stride = 1
            self.augmentation = 0
        else:
            self.annotations = self._read_all_annotations(self.split)
            self.segments, self.segment_idx_to_metadata = self._generate_segments()

    def _read_all_annotations(self, split):
        path = os.path.join(self.precomputed_folder, f"data_3d_{self.dataset_name}.npz")
        data_o = np.load(path, allow_pickle=True)["positions_3d"].item()
        if self.if_zero_shot and split == "test":
            data_f = {name: seq for s in data_o for name, seq in data_o[s].items()}
        else:
            data_f = data_o[split]
        self.idx_to_class = list(data_f.keys())
        self.class_to_idx = {v: k for k, v in enumerate(self.idx_to_class)}
        anns_all = []
        self.dict_indices = {}
        self.clip_idx_to_metadata = []
        for counter, (seq_name, seq) in enumerate(data_f.items()):
            self.dict_indices[seq_name] = counter
            self.clip_idx_to_metadata.append((seq_name, seq_name))
            # 3DPW ships 24 SMPL joints; truncate to the skeleton's 22
            anns_all.append(seq[..., : self.skeleton.num_joints, :].astype(self.dtype))
        return anns_all

    def _load_annotations_and_segments(self, segments_path):
        import pandas as pd

        df = pd.read_csv(segments_path)
        self.annotations = self._read_all_annotations(self.split)
        segments = [
            (self.dict_indices[row["name"]], int(row["init"]), int(row["pred_end"]))
            for _, row in df.iterrows()
        ]
        seg2meta = [(row["name"], row["name"]) for _, row in df.iterrows()]
        return segments, seg2meta


class D3PWZeroShotDataset(ZeroShotAMASSDataset):
    """Reference `loaders/__init__.py:7-8` alias."""

    dataset_name = "3dpw"


DATASET_CLASSES = {
    "AMASSDataset": AMASSDataset,
    "H36MDataset": H36MDataset,
    "FreeManDataset": FreeManDataset,
    "ZeroShotAMASSDataset": ZeroShotAMASSDataset,
    "D3PWZeroShotDataset": D3PWZeroShotDataset,
}
