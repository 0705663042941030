"""Unit test for the convergence capstone's evidence-assembly logic
(`scripts/convergence_capstone.py::analyze`) on a fabricated run root —
guards the check definitions (VERDICT r3 #1 (a)-(d)) without training.

The real end-to-end run is exercised by the script itself (`--smoke` on
CPU, full on TPU → docs/convergence.json); this pins the reporting layer:
which JSONL rows feed each check, the LR-floor/curriculum thresholds, and
that each check actually fails when its evidence is absent or reversed.
"""
import importlib.util
import json
import os
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "convergence_capstone.py")


@pytest.fixture(scope="module")
def capstone():
    spec = importlib.util.spec_from_file_location("convergence_capstone", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _fabricate(root, *, good=True):
    """A minimal capstone root whose evidence either passes every check
    (good=True) or fails them all (good=False)."""
    ae_dir = os.path.join(root, "out_ae")
    diff_dirs = {v: os.path.join(root, f"out_diff_{v}")
                 for v in ("k1", "k50_latent", "k50_motion")}

    lr_floor = 1.0e-4 if good else 3.0e-4     # floor is 1e-4
    ph_max = 118.0 if good else 40.0          # annealed means >= 0.9*120
    _write_jsonl(os.path.join(ae_dir, "metrics.jsonl"), [
        {"prefix": "train", "step": 1, "lr": 5e-3, "loss": 1.0},
        {"prefix": "train_iter", "step": 10, "ph": 30.0},
        {"prefix": "train_iter", "step": 400, "ph": ph_max},
        {"prefix": "valid", "step": 10, "ADE": 0.7},
        {"prefix": "valid", "step": 200, "ADE": 0.14 if good else 0.9},
        {"prefix": "train", "step": 210, "lr": lr_floor, "loss": 0.01},
    ])
    _write_jsonl(os.path.join(diff_dirs["k50_motion"], "metrics.jsonl"), [
        {"prefix": "train", "step": 1, "lr": 1e-3, "loss": 1.0},
        {"prefix": "valid", "step": 10, "ADE": 0.5},
        {"prefix": "valid", "step": 100, "ADE": 0.2 if good else 0.8},
        {"prefix": "train", "step": 150, "lr": lr_floor, "loss": 0.02},
    ])
    ckpts = os.path.join(diff_dirs["k50_motion"], "checkpoints")
    for name in (("100", "150") if good else ("100",)):
        os.makedirs(os.path.join(ckpts, name), exist_ok=True)

    zv = {"ADE": 0.50, "FDE": 0.90, "APD": 0.0}
    if good:
        results = {
            "zero_velocity": zv,
            "k1": {"ADE": 0.22, "FDE": 0.40, "APD": 0.10},
            "k50_latent": {"ADE": 0.20, "FDE": 0.36, "APD": 0.55},
            "k50_motion": {"ADE": 0.18, "FDE": 0.33, "APD": 0.80,
                           "StretchMean": 2.5, "StretchRMSE": 4.0},
        }
    else:  # flagship no better than ZV, APD ordering reversed
        results = {
            "zero_velocity": zv,
            "k1": {"ADE": 0.52, "FDE": 0.95, "APD": 0.80},
            "k50_latent": {"ADE": 0.51, "FDE": 0.93, "APD": 0.55},
            "k50_motion": {"ADE": 0.50, "FDE": 0.91, "APD": 0.10},
        }
    return ae_dir, diff_dirs, results


CONFIG = dict(obs_len=30, pred_len=120, clip_len=480, files_per_dataset=25,
              ae_epochs=210, diff_epochs=150, k=50, num_samples=50)


def test_analyze_all_checks_pass_on_good_evidence(capstone, tmp_path):
    ae_dir, diff_dirs, results = _fabricate(str(tmp_path), good=True)
    report = capstone.analyze(str(tmp_path), ae_dir, diff_dirs, results,
                              smoke=False, timings={}, config=CONFIG)
    assert report["checks"] and all(report["checks"].values()), report["checks"]
    # evidence trail surfaces the raw series, not just booleans
    assert report["valid_ade_trajectory_k50_motion"] == [[10, 0.5], [100, 0.2]] or \
        report["valid_ade_trajectory_k50_motion"] == [(10, 0.5), (100, 0.2)]
    assert report["final_lr"] == {"autoencoder": 1e-4, "diffusion": 1e-4}
    assert report["curriculum_ph_max"] == 118.0
    assert report["kept_checkpoints_k50_motion"] == ["100", "150"]


def test_analyze_every_check_fails_on_bad_evidence(capstone, tmp_path):
    ae_dir, diff_dirs, results = _fabricate(str(tmp_path), good=False)
    report = capstone.analyze(str(tmp_path), ae_dir, diff_dirs, results,
                              smoke=False, timings={}, config=CONFIG)
    assert not any(report["checks"].values()), report["checks"]


def test_analyze_partial_variants(capstone, tmp_path):
    """--only-done-variants: APD-ordering checks involving a skipped variant
    are None (not judged), the miss is recorded, and the judged flagship
    checks still pass."""
    ae_dir, diff_dirs, results = _fabricate(str(tmp_path), good=True)
    del results["k50_latent"]
    diff_dirs.pop("k50_latent")
    report = capstone.analyze(str(tmp_path), ae_dir, diff_dirs, results,
                              smoke=False, timings={}, config=CONFIG)
    checks = report["checks"]
    assert checks["apd_ordering_motion_gt_latent"] is None
    assert checks["apd_ordering_latent_gt_k1"] is None
    assert report["partial_variants_missing"] == ["k50_latent"]
    judged = {k: v for k, v in checks.items() if v is not None}
    assert judged and all(judged.values()), checks


def test_analyze_margin_thresholds(capstone, tmp_path):
    """Beating ZV requires a WIDE margin (<0.6x), not merely being better."""
    ae_dir, diff_dirs, results = _fabricate(str(tmp_path), good=True)
    results["k50_motion"]["ADE"] = 0.59 * results["zero_velocity"]["ADE"]
    results["k50_motion"]["FDE"] = 0.61 * results["zero_velocity"]["FDE"]
    report = capstone.analyze(str(tmp_path), ae_dir, diff_dirs, results,
                              smoke=False, timings={}, config=CONFIG)
    assert report["checks"]["flagship_beats_zero_velocity_ade"]
    assert not report["checks"]["flagship_beats_zero_velocity_fde"]


def test_analyze_banks_before_any_variant(capstone, tmp_path):
    """Per-phase evidence banking (VERDICT r4 ask #2): analyze must be
    callable right after stage-1 (no stage-2 variants, no evals yet) and
    report every unjudgeable check as None — not crash, not fake a FAIL."""
    ae_dir, _, _ = _fabricate(str(tmp_path), good=True)
    report = capstone.analyze(str(tmp_path), ae_dir, {}, {},
                              smoke=False, timings={}, config=CONFIG)
    checks = report["checks"]
    # stage-1 evidence is judgeable
    assert checks["ae_lr_reached_floor"] is True
    assert checks["ae_val_ade_improved"] is True
    assert checks["curriculum_fully_annealed"] is True
    # everything downstream of stage-2 is explicitly not-judged
    for key in ("flagship_beats_zero_velocity_ade",
                "flagship_beats_zero_velocity_fde",
                "apd_ordering_motion_gt_latent", "apd_ordering_latent_gt_k1",
                "ema_val_ade_improved", "topk_checkpoints_rotated",
                "diff_lr_reached_floor"):
        assert checks[key] is None, (key, checks[key])
    assert report["partial_variants_missing"] == ["k1", "k50_motion", "k50_latent"]


def test_analyze_reports_raw_margins(capstone, tmp_path):
    """VERDICT r4 weak #2: raw margins ship next to the booleans, so a pass
    by 1% reads differently from a pass by 5x."""
    ae_dir, diff_dirs, results = _fabricate(str(tmp_path), good=True)
    report = capstone.analyze(str(tmp_path), ae_dir, diff_dirs, results,
                              smoke=False, timings={}, config=CONFIG)
    m = report["margins"]
    assert m["flagship_over_zv_ade_ratio"] == round(0.18 / 0.50, 4)
    assert m["flagship_over_zv_fde_ratio"] == round(0.33 / 0.90, 4)
    assert m["apd_motion_over_latent_ratio"] == round(0.80 / 0.55, 4)
    assert m["apd_latent_over_k1_ratio"] == round(0.55 / 0.10, 4)
    assert m["curriculum_ph_max_over_pred_len"] == round(118.0 / 120, 4)
    # partial run: margins involving missing variants are None
    del results["k50_latent"]
    report = capstone.analyze(str(tmp_path), ae_dir, diff_dirs, results,
                              smoke=False, timings={}, config=CONFIG)
    assert report["margins"]["apd_motion_over_latent_ratio"] is None
    assert report["margins"]["apd_latent_over_k1_ratio"] is None


def test_analyze_surfaces_flagship_limb_stretch(capstone, tmp_path):
    """VERDICT r4 ask #6: rigid synthetic FK means GT limb stretch is 0 mm;
    the flagship's StretchMean/RMSE ship in the report as a limb-realism
    signal, and are None-safe when the flagship has not been evaluated."""
    ae_dir, diff_dirs, results = _fabricate(str(tmp_path), good=True)
    report = capstone.analyze(str(tmp_path), ae_dir, diff_dirs, results,
                              smoke=False, timings={}, config=CONFIG)
    stretch = report["limb_stretch_flagship_mm"]
    assert stretch == {"StretchMean": 2.5, "StretchRMSE": 4.0,
                       "gt_stretch_mm": 0.0}
    del results["k50_motion"]
    report = capstone.analyze(str(tmp_path), ae_dir, diff_dirs, results,
                              smoke=False, timings={}, config=CONFIG)
    assert report["limb_stretch_flagship_mm"] is None
