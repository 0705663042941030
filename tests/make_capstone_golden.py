"""Capstone cross-implementation golden: drive the REFERENCE pipeline
end-to-end on tiny synthetic AMASS data and record every seam's output.

Run ONCE at test-authoring time (requires /root/reference mounted):

    python tests/make_capstone_golden.py

What it covers that the unit goldens don't (VERDICT r2 "missing #1"): the
COMPOSED path — segment generation (`base_dataset.py:189-198` semantics via
`segments_test.csv`), mm-GT neighbor construction with the cdist threshold
(`math_utils.py:59-110`), CMD mean-motion statistics (`math_utils.py:8-48`),
input/metric-space transforms (`rescalepose.py:17-39`), the conditioned
10-step ancestral sampler with injected noise (`base.py:324-390`), the
100-step-style decode, and the reference's metric accumulation
(`eval.py:28-120` + `config_metrics.py:71-96` + the MetricStorer family) —
all through the reference's OWN code, with only numeric outputs extracted.

The paired test is ``tests/test_capstone_parity.py``: it rebuilds the same
files, ports the recorded weights into the JAX models, injects the same
noise, runs OUR ``compute_metrics`` and pins the final metric dict (plus
per-batch intermediates) against this golden.
"""
import json
import math
import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "goldens")
ROOT = "/tmp/capstone_ref_root"
os.makedirs(OUT, exist_ok=True)
os.makedirs(ROOT, exist_ok=True)

import torch  # noqa: E402

torch.set_default_dtype(torch.float32)
torch.manual_seed(0)

# numpy 2.x removed the np.NaN alias the reference uses (`apde.py:18`)
if not hasattr(np, "NaN"):
    np.NaN = np.nan

# ---------------------------------------------------------------------------
# Stubs for packages absent from this image.  The reference's metric storers
# subclass ignite.metrics.Metric — give them a minimal functional base class
# so the reference's own update/compute logic runs unchanged.
# ---------------------------------------------------------------------------


class _Metric:
    def __init__(self, output_transform=lambda x: x, **kwargs):
        self._output_transform = output_transform
        self.reset()

    def reset(self):  # subclasses call super().reset()
        pass

    def attach(self, engine, name):
        engine.metrics[name] = self


_ignite = types.ModuleType("ignite")
_ignite_metrics = types.ModuleType("ignite.metrics")
_ignite_metrics.Metric = _Metric
_ignite_exceptions = types.ModuleType("ignite.exceptions")


class NotComputableError(Exception):
    pass


_ignite_exceptions.NotComputableError = NotComputableError
_ignite.metrics = _ignite_metrics
_ignite.exceptions = _ignite_exceptions
for name, mod in (
    ("ignite", _ignite),
    ("ignite.metrics", _ignite_metrics),
    ("ignite.exceptions", _ignite_exceptions),
):
    sys.modules.setdefault(name, mod)

# hydra/omegaconf: imported at module top of src.inference_utils (which
# src.eval_prepare_model pulls in); none of their symbols are exercised here
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


class _SinusoidalPosEmb(torch.nn.Module):
    """Functional stand-in for lucidrains' SinusoidalPosEmb (standard
    transformer sinusoidal embedding over scalar timesteps) — same stub as
    tests/make_goldens.py."""

    def __init__(self, dim, theta=10000):
        super().__init__()
        self.dim, self.theta = dim, theta

    def forward(self, x):
        half_dim = self.dim // 2
        emb = math.log(self.theta) / (half_dim - 1)
        emb = torch.exp(torch.arange(half_dim, device=x.device) * -emb)
        emb = x[:, None] * emb[None, :]
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


_ddp = types.ModuleType("denoising_diffusion_pytorch")
_ddp1d = types.ModuleType("denoising_diffusion_pytorch.denoising_diffusion_pytorch_1d")
_ddp1d.RandomOrLearnedSinusoidalPosEmb = object
_ddp1d.SinusoidalPosEmb = _SinusoidalPosEmb
_ddp.denoising_diffusion_pytorch_1d = _ddp1d
sys.modules.setdefault("denoising_diffusion_pytorch", _ddp)
sys.modules.setdefault(
    "denoising_diffusion_pytorch.denoising_diffusion_pytorch_1d", _ddp1d
)

sys.path.insert(0, REF)

from src.config_metrics import attach_engine_to_metrics  # noqa: E402
from src.core.diffusion_manager import DiffusionManager  # noqa: E402
from src.core.network.nn import AutoEncoder  # noqa: E402
from src.data.loaders import AMASSDataset, custom_collate_for_mmgt  # noqa: E402
from src.data.loaders.base.create_dataset_utils import (  # noqa: E402
    compute_multimodal_gt_onsplit,
)
from src.data.loaders.base.math_utils import compute_mean_motions  # noqa: E402
from src.data.skeleton import create_skeleton  # noqa: E402
from src.eval_prepare_model import (  # noqa: E402
    get_prediction,
    process_evaluation_pair,
)
from functools import partial  # noqa: E402

from torch.utils.data import DataLoader  # noqa: E402

# ---------------------------------------------------------------------------
# Configuration of the tiny pipeline (kept flagship-shaped: RescalePose,
# nonisotropic skeleton-diffusion covariance, pred_x0, cosine β, T=10,
# conditioned denoiser with attention — only the sizes are scaled down)
# ---------------------------------------------------------------------------
OBS, PRED, J = 6, 12, 22
LATENT, HID = 16, 16
T_DIFF, S, BATCH = 10, 3, 5
POSE_BOX = 1.2
MM_THRESHOLD = 1.1  # tuned: neighbor counts span sparse→dense (histogram printed)
CLASSES = ["DFaust", "DanceDB", "GRAB", "HUMAN4D", "SOMA", "SSM", "Transitions"]
CLIP_LEN = 40


def build_raw_data():
    """Smooth random-walk motion for all 7 AMASS CMD classes (2 clips for
    DFaust, 1 each otherwise).  Returns {dataset: {file_idx: [T,22,3]}}."""
    rng = np.random.default_rng(123)
    base = rng.standard_normal((J, 3)).astype(np.float64) * 0.25
    data = {}
    for ci, cls in enumerate(CLASSES):
        n_files = 2 if cls == "DFaust" else 1
        data[cls] = {}
        for fi in range(n_files):
            steps = rng.standard_normal((CLIP_LEN, J, 3)) * 0.02 * (1 + 0.3 * ci)
            drift = rng.standard_normal((CLIP_LEN, 1, 3)) * 0.01
            seq = base[None] + np.cumsum(steps + drift, axis=0)
            data[cls][fi] = seq.astype(np.float32)
    return data


def build_files(root):
    import pandas as pd

    data = build_raw_data()
    np.savez(os.path.join(root, "data_3d_amass.npz"), positions_3d=data)
    rows = []
    for cls in CLASSES:
        for fi in sorted(data[cls].keys()):
            for init in range(OBS, CLIP_LEN - PRED, 9):
                rows.append(
                    {
                        "dataset": cls,
                        "file": f"{cls}_f{fi}",
                        "file_idx": fi,
                        "pred_init": init,
                        "pred_end": init + PRED - 1,
                    }
                )
    pd.DataFrame(rows).to_csv(os.path.join(root, "segments_test.csv"), index=False)
    return data, rows


def main():
    import pandas as pd

    data, seg_rows = build_files(ROOT)
    n_segments = len(seg_rows)
    print(f"{n_segments} segments")

    skeleton = create_skeleton(
        dataset_name="amass",
        motion_repr_type="SkeletonRescalePose",
        num_joints=J,
        pose_box_size=POSE_BOX,
        obs_length=OBS,
        pred_length=PRED,
        if_consider_hip=False,
    )
    N = skeleton.num_nodes  # 21 (hip dropped)
    csv_path = os.path.join(ROOT, "segments_test.csv")

    ds_kwargs = dict(
        datasets=CLASSES,
        split="test",
        segments_path=csv_path,
        precomputed_folder=ROOT,
        skeleton=skeleton,
        obs_length=OBS,
        pred_length=PRED,
        if_consider_hip=False,
        silent=True,
    )

    # --- CMD mean-motion statistics (reference compute_stats flow) ----------
    stats_ds = AMASSDataset(**ds_kwargs)
    class_avg, mean_motions, freqs = compute_mean_motions(stats_ds, batch_size=128)
    mm_path = os.path.join(ROOT, "mean_motion_test.txt")
    with open(mm_path, "w") as fh:
        fh.write(
            "\n".join(
                f"{c},{m},{f}" for c, m, f in zip(list(class_avg.keys()), mean_motions, freqs)
            )
        )

    # --- multimodal GT (reference math_utils.get_multimodal_gt) -------------
    mmgt_path = os.path.join(ROOT, "mmgt_test.txt")
    if os.path.exists(mmgt_path):
        os.remove(mmgt_path)
    mmgt = compute_multimodal_gt_onsplit(
        Dataset=partial(AMASSDataset, **ds_kwargs),
        dest_path=mmgt_path,
        multimodal_threshold=MM_THRESHOLD,
        batch_size=10,  # does not divide n_segments → exercises the chunked double loop
    )
    counts = sorted(len(v) for v in mmgt.values())
    print("mm-GT neighbor counts:", counts)

    # --- APDE ground-truth file (synthetic, one zero → NaN-exclusion path) --
    rng = np.random.default_rng(7)
    apd_vals = np.round(rng.uniform(0.5, 2.0, n_segments), 6)
    apd_vals[3] = 0.0  # reference replaces 0 with NaN and excludes it
    pd.DataFrame({"gt_APD": apd_vals}).to_csv(os.path.join(ROOT, "mmapd_GT.csv"))

    # --- eval dataset (loads mm-GT + mean motion like the real eval) --------
    dataset = AMASSDataset(**ds_kwargs, if_load_mmgt=True, if_compute_cmd=True)
    loader = DataLoader(
        dataset,
        batch_size=BATCH,
        shuffle=False,
        num_workers=0,
        drop_last=False,
        collate_fn=custom_collate_for_mmgt,
    )

    # --- models (random torch init; weights recorded for porting) -----------
    torch.manual_seed(1234)
    ae = AutoEncoder(
        num_nodes=N,
        encoder_hidden_size=HID,
        decoder_hidden_size=HID,
        latent_size=LATENT,
        node_types=skeleton.nodes_type_id,
        input_size=3,
        z_activation="tanh",
        enc_num_layers=1,
        loss_pose_type="l1",
        output_size=3,
        if_consider_hip=False,
        recurrent_arch_enc="StaticGraphGRU",
        recurrent_arch_decoder="StaticGraphGRU",
    ).eval()

    manager = DiffusionManager(
        diffusion_type="NonisotropicGaussianDiffusion",
        skeleton=skeleton,
        covariance_matrix_type="adjacency",
        if_sigma_n_scale=True,
        sigma_n_scale="spectral",
        if_run_as_isotropic=False,
        num_nodes=N,
        node_types=skeleton.nodes_type_id,
        diffusion_conditioning=True,
        latent_size=LATENT,
        diffusion_timesteps=T_DIFF,
        diffusion_objective="pred_x0",
        beta_schedule="cosine",
        diffusion_covariance_type="skeleton-diffusion",
        gamma_scheduler="cosine",
        loss_reduction_type="l1",
        diffusion_activation="identity",
        diffusion_arch={
            "use_attention": True,
            "self_condition": False,
            "norm_type": "none",
            "depth": 2,
            "attn_dim_head": 8,
            "attn_heads": 2,
            "learn_influence": True,
        },
    )
    diffusion = manager.get_diffusion().eval()
    if hasattr(diffusion, "silent"):
        diffusion.silent = True

    # --- metric storers via the reference's own wiring -----------------------
    engine = types.SimpleNamespace(metrics={})
    attach_engine_to_metrics(
        engine=engine,
        dataset_split="test",
        stats_mode="probabilistic",
        dataset=dataset,
        skeleton=skeleton,
        if_compute_cmd=True,
        if_compute_fid=False,
        if_compute_apde=True,
        if_consider_hip=False,
        dataset_name="amass",
        annotations_folder=ROOT,
    )
    for m in engine.metrics.values():
        m.reset()

    # --- eval loop (reference eval.py:69-87 process_function, no ignite) ----
    noise_rng = np.random.default_rng(2024)
    golden = {}
    with torch.no_grad():
        for b_i, (obs, target, extra) in enumerate(loader):
            b = obs.shape[0]
            start = noise_rng.standard_normal((b * S, N, LATENT)).astype(np.float32)
            samp = noise_rng.standard_normal((b * S, T_DIFF - 1, N, LATENT)).astype(
                np.float32
            )
            pred = get_prediction(
                obs,
                (ae, diffusion),
                num_samples=S,
                pred_length=PRED,
                diffusion_conditioning=True,
                sampler_kwargs={
                    "start_noise": torch.from_numpy(start),
                    "sampling_noise": torch.from_numpy(samp),
                },
            )
            target_m, pred_m, mm_gt_m, obs_m = process_evaluation_pair(
                skeleton,
                target=target,
                pred_dict={"pred": pred, "obs": obs, "mm_gt": extra["mm_gt"]},
            )
            outdict = {
                "pred": pred_m,
                "target": target_m,
                "extra": extra,
                "mm_gt": mm_gt_m,
                "obs": obs_m,
            }
            for name, metric in engine.metrics.items():
                metric.update(metric._output_transform(outdict.copy()))

            golden[f"obs_{b_i}"] = obs.numpy()
            golden[f"target_{b_i}"] = target.numpy()
            golden[f"start_noise_{b_i}"] = start
            golden[f"samp_noise_{b_i}"] = samp
            golden[f"pred_m_{b_i}"] = pred_m.numpy()
            golden[f"target_m_{b_i}"] = target_m.numpy()

    results = {name: float(np.asarray(m.compute())) for name, m in engine.metrics.items()}
    print("reference results:", results)

    # --- dump -----------------------------------------------------------------
    for cls in CLASSES:
        for fi, seq in data[cls].items():
            golden[f"raw_{cls}_{fi}"] = seq
    golden["segments_csv"] = np.array(
        json.dumps([[r["dataset"], r["file"], r["file_idx"], r["pred_init"], r["pred_end"]] for r in seg_rows])
    )
    golden["mmgt_json"] = np.array(json.dumps({str(k): sorted(v) for k, v in mmgt.items()}))
    golden["mean_motions"] = np.asarray(mean_motions, dtype=np.float64)
    golden["mean_motion_freqs"] = np.asarray(freqs, dtype=np.float64)
    golden["mmapd_gt"] = apd_vals
    golden["n_batches"] = np.asarray(b_i + 1)
    golden["results_json"] = np.array(json.dumps(results))
    golden["config_json"] = np.array(
        json.dumps(
            dict(
                obs=OBS, pred=PRED, num_joints=J, latent=LATENT, hidden=HID,
                t_diff=T_DIFF, samples=S, batch=BATCH, pose_box=POSE_BOX,
                mm_threshold=MM_THRESHOLD, classes=CLASSES,
            )
        )
    )
    # covariance eigensystem: U is unique only up to per-column sign (and
    # basis rotation inside degenerate eigenspaces), and the injected
    # sampling noise is expressed in U's column basis — cross-implementation
    # noise injection therefore requires BOTH sides to use the same U.  The
    # parity of our own covariance construction vs the reference's is pinned
    # separately (sign-corrected) in tests/test_diffusion_goldens.py.
    golden["cov_Sigma_N"] = diffusion.Sigma_N.detach().cpu().numpy()
    golden["cov_Lambda_N"] = diffusion.Lambda_N.detach().cpu().numpy()
    golden["cov_U"] = diffusion.U.detach().cpu().numpy()
    for k, v in ae.state_dict().items():
        golden[f"ae.{k}"] = v.detach().cpu().numpy()
    for k, v in diffusion.model.state_dict().items():
        golden[f"den.{k}"] = v.detach().cpu().numpy()

    np.savez(os.path.join(OUT, "capstone.npz"), **golden)
    print("capstone golden written:", os.path.join(OUT, "capstone.npz"))


if __name__ == "__main__":
    main()
