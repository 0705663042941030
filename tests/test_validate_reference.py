"""The real-checkpoint validation harness (scripts/validate_reference.py)
exercised end-to-end on the golden-weight fixtures: reference-format ``.pt``
checkpoints (torch state dicts under a ``model`` key, diffusion wrapped with
buffers + ``model.`` prefix) → torch_port → full probabilistic eval →
expected-table diff.  Ready to run on the published HuggingFace checkpoints
+ real data_3d_amass.npz when they land (reference README.md:154-157,
281-283)."""
import os
import sys

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "goldens")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLD, "denoiser_fwd.npz")),
    reason="golden fixtures not generated",
)

OBS, PRED, J = 30, 120, 22


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    import torch

    root = tmp_path_factory.mktemp("valref")
    pre = root / "datasets" / "processed" / "AMASS" / "hmp"
    ann = root / "datasets" / "annotations" / "AMASS" / "hmp"
    pre.mkdir(parents=True)
    ann.mkdir(parents=True)
    rng = np.random.default_rng(0)
    positions = {"DFaust": {fi: rng.standard_normal((180, J, 3)).astype(np.float32) * 0.3
                            for fi in range(2)}}
    np.savez(pre / "data_3d_amass.npz", positions_3d=positions)
    import pandas as pd

    rows = [
        {"dataset": "DFaust", "file": f"f{fi}", "file_idx": fi, "pred_init": OBS,
         "pred_end": OBS + PRED - 1}
        for fi in range(2)
    ]
    pd.DataFrame(rows).to_csv(ann / "segments_test.csv", index=False)

    # mm-GT file (probabilistic mode loads it)
    from skeletondiffusion_tpu.data import AMASSDataset, compute_multimodal_gt_for_dataset
    from skeletondiffusion_tpu.skeleton import create_skeleton

    sk = create_skeleton(dataset_name="amass", motion_repr_type="SkeletonRescalePose",
                         num_joints=J, pose_box_size=1.2, obs_length=OBS,
                         pred_length=PRED, if_consider_hip=False)
    ds = AMASSDataset(datasets=["DFaust"], split="test", precomputed_folder=str(pre),
                      skeleton=sk, obs_length=OBS, pred_length=PRED,
                      segments_path=str(ann / "segments_test.csv"),
                      if_consider_hip=False, silent=True)
    compute_multimodal_gt_for_dataset(ds, sk, multimodal_threshold=5.0,
                                      dest_path=str(pre / "mmgt_test.txt"))

    # reference-format .pt checkpoints from the golden weights
    ae_g = np.load(os.path.join(GOLD, "autoencoder_fwd.npz"))
    ae_sd = {k: torch.from_numpy(ae_g[k]) for k in ae_g.files
             if k not in ("past", "fut", "out", "z_past", "z", "dec", "loss_none")}
    torch.save({"model": ae_sd}, root / "ae.pt")

    den_g = np.load(os.path.join(GOLD, "denoiser_fwd.npz"))
    den_sd = {f"model.{k}": torch.from_numpy(den_g[k]) for k in den_g.files
              if k not in ("x", "t", "cond", "out")}
    # diffusion-module extras the harness must drop (reference registers
    # schedule buffers on the wrapper, `base.py:103-134`)
    den_sd["betas"] = torch.linspace(1e-4, 2e-2, 10)
    den_sd["posterior_variance"] = torch.ones(10)
    torch.save({"model": den_sd}, root / "diff.pt")
    return str(root)


def test_validate_reference_harness(env):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))
    from validate_reference import diff_results, run_validation

    results = run_validation(
        os.path.join(env, "ae.pt"),
        os.path.join(env, "diff.pt"),
        os.path.join(env, "datasets"),
        pose_box_size=1.2, obs_length=OBS, pred_length=PRED,
        batch_size=2, num_samples=2, datasets=["DFaust"],
        if_compute_cmd=False, if_compute_apde=False,
    )
    for k in ("ADE", "FDE", "APD", "MMADE", "MMFDE", "StretchMean", "StretchRMSE"):
        assert k in results and np.isfinite(results[k]), (k, results)

    ok_rows = diff_results(results, {"APD": results["APD"]}, tol=1e-6)
    assert ok_rows[0][3]
    bad_rows = diff_results(results, {"APD": results["APD"] + 1.0}, tol=1e-3)
    assert not bad_rows[0][3]
