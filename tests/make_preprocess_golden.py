"""Preprocessing cross-implementation golden: drive the REFERENCE's own
``create_h36m_dataset.py::preprocess_dataset`` (with a cdflib stub feeding
pre-extracted arrays) and ``create_freeman_dataset.py::preprocess_dataset``
on the synthetic raw trees from ``preprocess_raw_fixtures.py``, and record
every output sequence (VERDICT r3 next-round #4 — these two non-FK
preprocessing paths previously had only hand-derived expectations).

Run ONCE at test-authoring time (requires /root/reference mounted):

    python tests/make_preprocess_golden.py

Only numeric outputs are extracted — no reference code is copied.  The raw
inputs are regenerated from the shared fixture module at test time, so the
golden stores outputs only.
"""
import os
import shutil
import sys
import tempfile
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"
OUT = os.path.join(HERE, "goldens")
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, HERE)

from preprocess_raw_fixtures import (  # noqa: E402
    h36m_raw, write_freeman_tree, write_h36m_tree,
)

if not hasattr(np, "NaN"):
    np.NaN = np.nan

# ---------------------------------------------------------------------------
# import stubs: cdflib is absent from this image — the stub feeds the
# npy-format blobs the fixture writes under .cdf names (same [T,32,3] float64
# a real CDF 'Pose' variable reshapes to); tqdm/torch deps of the loaders
# package are present.
# ---------------------------------------------------------------------------


class _FakeCDF:
    def __init__(self, path):
        with open(path, "rb") as fh:
            self._pose = np.load(fh)

    def __getitem__(self, key):
        assert key == "Pose", key
        return self._pose


_cdflib = types.ModuleType("cdflib")
_cdflib.CDF = _FakeCDF
sys.modules["cdflib"] = _cdflib

# hydra/omegaconf stubs as in the sibling golden makers
_hydra = types.ModuleType("hydra")
_hydra.initialize = lambda *a, **k: None
_hydra.compose = lambda *a, **k: None
_hydra.main = lambda *a, **k: (lambda f: f)
_omegaconf = types.ModuleType("omegaconf")
_omegaconf.OmegaConf = types.SimpleNamespace(
    register_new_resolver=lambda *a, **k: None,
    to_container=lambda c, **k: c,
)
_omegaconf.DictConfig = dict
sys.modules.setdefault("hydra", _hydra)
sys.modules.setdefault("omegaconf", _omegaconf)

sys.path.insert(0, REF)

from src.data.create_freeman_dataset import preprocess_dataset as freeman_pre  # noqa: E402
from src.data.create_h36m_dataset import preprocess_dataset as h36m_pre  # noqa: E402


def flatten_h36m(out):
    return {f"{subj}|{act}": arr for subj, acts in out.items() for act, arr in acts.items()}


def main():
    tmp = tempfile.mkdtemp(prefix="preproc_golden_")
    try:
        # ---- H36M: 17- and 25-joint conversions --------------------------
        raw_tree = os.path.join(tmp, "h36m_raw")
        write_h36m_tree(raw_tree, h36m_raw(), ext="cdf")
        golden = {}
        for nj in (17, 25):
            out = h36m_pre(
                raw_tree, num_joints=nj,
                output_path=os.path.join(tmp, f"data_3d_h36m_{nj}"),
                subjects=["S1", "S11"],
            )
            flat = flatten_h36m(out)
            # canonicalization + corrupted-video skip actually exercised
            assert "S11|Directions" not in flat and "S1|Directions" in flat
            assert "S1|Photo" in flat and "S1|WalkDog_1" in flat
            assert "S1|Walking_1" in flat and "S1|TakingPhoto" not in flat
            for k, v in flat.items():
                assert v.dtype == np.float32 and v.shape[1] == nj, (k, v.shape)
                golden[f"h36m{nj}|{k}"] = v

        # ---- FreeMan -------------------------------------------------------
        ds_dir = os.path.join(tmp, "freeman_raw")
        ann_dir = os.path.join(tmp, "freeman_ann")
        write_freeman_tree(ds_dir, ann_dir)
        out_path = os.path.join(tmp, "data_3d_freeman")
        freeman_pre(ds_dir, ann_dir, output_path=out_path)
        fm = np.load(out_path + ".npz", allow_pickle=True)["positions_3d"].item()
        # every slicing/skip branch exercised
        keys = set(fm)
        assert keys == {
            "20220801_aa1_subj01", "20220802_bb2_subj02", "20220803_cc3_subj03",
            "20220804_dd4_subj04_slice1", "20220804_dd4_subj04_slice2",
        }, keys
        assert fm["20220803_cc3_subj03"].shape[0] == 40  # trimmed [5:45]
        for k, v in fm.items():
            assert v.dtype == np.float32 and v.shape[1:] == (18, 3), (k, v.shape)
            golden[f"freeman|{k}"] = v

        np.savez_compressed(os.path.join(OUT, "preprocess.npz"), **golden)
        print(f"wrote goldens/preprocess.npz with {len(golden)} sequences")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
