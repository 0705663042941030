"""Long-term recursion golden: drive the REFERENCE's own
``long_term_prediction_best_every50`` / ``best_first50`` (`src/eval_utils.py:44-99`)
with a shared deterministic predictor and record every output.

Run ONCE at test-authoring time (requires /root/reference mounted):

    python tests/make_longterm_golden.py

What it covers that ``tests/make_capstone_golden.py`` doesn't: the long-term
seam — per-round target slicing (`eval_utils.py:56`), the fractional-factor
``keep`` truncation (`eval_utils.py:53-54`, factor 2.5), the best-sample
selection norm (`metrics/utils.py:22-30`: per-JOINT L2 → mean joints → mean
time, which is NOT the ADE whole-pose norm), the observation feedback chain,
the final concat + sample-repeat, and the dead-but-present ``best_first50``
strategy's per-sample autoregressive propagation.

The skeleton is CenterPose with ``if_consider_hip=False`` — the one
configuration where metric space ≡ input space, so the reference's
metric-space feedback (`eval_utils.py:63`; a pose_box_size inflation bug
under RescalePose, documented in ``eval_pipeline.py``) coincides with our
input-space feedback and the remaining semantics can be pinned exactly.

The fake predictor is closed-form (constant-velocity extrapolation + a
per-(sample, joint) offset table drawn once and SAVED in the golden), so the
JAX side reproduces it bit-for-bit without any network.  The offsets give
different samples differently-distributed per-joint errors, which makes the
per-joint selection argmin genuinely disagree with an ADE argmin on this
data (asserted below) — the golden would catch a wrong selection norm.

Only numeric outputs are extracted — no reference code is copied.
"""
import math
import os
import sys
import types
from functools import partial

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "goldens")
os.makedirs(OUT, exist_ok=True)

import torch  # noqa: E402

torch.set_default_dtype(torch.float32)
torch.manual_seed(0)

if not hasattr(np, "NaN"):
    np.NaN = np.nan

# Same import stubs as tests/make_capstone_golden.py (hydra/omegaconf and the
# lucidrains package are absent from this image; none of their symbols are
# exercised by the long-term functions).
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

_ddp = types.ModuleType("denoising_diffusion_pytorch")
_ddp1d = types.ModuleType("denoising_diffusion_pytorch.denoising_diffusion_pytorch_1d")
_ddp1d.RandomOrLearnedSinusoidalPosEmb = object
_ddp1d.SinusoidalPosEmb = object
_ddp.denoising_diffusion_pytorch_1d = _ddp1d
sys.modules.setdefault("denoising_diffusion_pytorch", _ddp)
sys.modules.setdefault(
    "denoising_diffusion_pytorch.denoising_diffusion_pytorch_1d", _ddp1d
)

sys.path.insert(0, REF)

import src.eval_utils as eval_utils  # noqa: E402

# upstream bug: src/eval_utils.py uses math.ceil but never imports math
eval_utils.math = math

from src.data.skeleton import create_skeleton  # noqa: E402
from src.eval_prepare_model import process_evaluation_pair  # noqa: E402

B, S, N_PAST, PRED, J = 2, 4, 5, 8, 22
FACTOR = 2.5
TOTAL = int(FACTOR * PRED)  # 20
VEL_SCALE_STEP = 0.01  # sample s extrapolates velocity scaled by 1 + s*step


def make_inputs():
    rng = np.random.default_rng(7)
    # smooth random-walk observation + ground truth continuing it
    start = rng.standard_normal((B, 1, J, 3)) * 0.3
    steps = rng.standard_normal((B, N_PAST + TOTAL, J, 3)) * 0.05
    seq = start + np.cumsum(steps, axis=1)
    obs = seq[:, :N_PAST].astype(np.float32)
    target = seq[:, N_PAST:].astype(np.float32)
    # per-(sample, joint) offsets built so the two selection norms disagree:
    # sample 0 concentrates error |e|=m in ONE joint (tiny mean-of-norms,
    # whole-pose norm = m); sample 1 spreads 0.95m evenly over all joints
    # (whole-pose 0.95m < m, but mean-of-norms 0.95m/√(J-1) ≫ m/(J-1));
    # samples 2-3 are uniformly worse.  Per-joint argmin → 0, ADE argmin → 1.
    m = 3.0
    n_pose = J - 1  # hip dropped by the skeleton
    offsets = np.zeros((S, J, 3), np.float32)
    offsets[0, 3] = m / np.sqrt(3.0)
    offsets[1, 1:] = 0.95 * m / np.sqrt(n_pose * 3.0)
    offsets[2, 1:] = 2.0 * m / np.sqrt(n_pose * 3.0)
    offsets[3, 1:] = -3.0 * m / np.sqrt(n_pose * 3.0)
    return obs, target, offsets


def fake_get_prediction(obs_t, offsets_t, num_samples=S, pred_length=PRED,
                        extra=None, **kw):
    """Deterministic stand-in for `eval_prepare_model.py:118-121`:
    constant-velocity extrapolation per sample + fixed per-joint offsets."""
    vel = obs_t[:, -1] - obs_t[:, -2]  # [B,J,3]
    last = obs_t[:, -1]
    t = torch.arange(1, pred_length + 1, dtype=obs_t.dtype)
    scale = 1.0 + VEL_SCALE_STEP * torch.arange(num_samples, dtype=obs_t.dtype)
    # pred[b,s,t] = last + vel * t * scale_s + offsets[s]
    pred = (
        last[:, None, None]
        + vel[:, None, None] * t[None, None, :, None, None] * scale[None, :, None, None, None]
        + offsets_t[None, :num_samples, None]
    )
    return pred


BOX = 1.5  # RescalePose pose_box_size for the metric-refeed golden


def run_reference(skeleton, obs_in, target_in, offsets_in):
    """Drive the reference's two long-term strategies with the shared
    closed-form predictor on a given skeleton."""
    config = {"long_term_factor": FACTOR, "pred_length": PRED}
    pep = partial(process_evaluation_pair, skeleton=skeleton)
    get_pred = partial(fake_get_prediction, offsets_t=offsets_in)
    t_every, p_every, _, _ = eval_utils.long_term_prediction_best_every50(
        data=obs_in.clone(), target=target_in.clone(), extra={},
        get_prediction=get_pred, process_evaluation_pair=pep,
        num_samples=S, config=config,
    )
    t_first, p_first, _, _ = eval_utils.long_term_prediction_best_first50(
        data=obs_in.clone(), target=target_in.clone(), extra={},
        get_prediction=get_pred, process_evaluation_pair=pep,
        num_samples=S, config=config,
    )
    assert p_every.shape == (B, S, TOTAL, J - 1, 3), p_every.shape
    assert p_first.shape == (B, S, TOTAL, J - 1, 3), p_first.shape
    return t_every, p_every, t_first, p_first


def main():
    obs, target, offsets = make_inputs()
    obs_t = torch.from_numpy(obs)
    target_t = torch.from_numpy(target)
    offsets_t = torch.from_numpy(offsets)

    skeleton = create_skeleton(
        dataset_name="amass",
        motion_repr_type="SkeletonCenterPose",
        num_joints=J,
        obs_length=N_PAST,
        pred_length=PRED,
        if_consider_hip=False,
    )
    # sanity: CenterPose + no-hip metric transform is the identity, so the
    # reference's metric-space feedback ≡ our input-space feedback here
    probe = torch.from_numpy(np.random.default_rng(0).standard_normal((2, 3, J - 1, 3)).astype(np.float32))
    assert torch.equal(skeleton.transform_to_metric_space(probe), probe)

    # the skeleton drops the hip joint (if_consider_hip=False → N-1 nodes);
    # feed hipless data directly, as compute_metrics does post-transform
    obs_in = obs_t[..., 1:, :]
    target_in = target_t[..., 1:, :]
    offsets_in = offsets_t[..., 1:, :]
    get_pred = partial(fake_get_prediction, offsets_t=offsets_in)

    # assert the two selection norms actually disagree on round-0 data
    pred0 = get_pred(obs_in)
    perjoint = torch.linalg.norm(pred0 - target_in[:, None, :PRED], dim=-1).mean(-1).mean(-1)
    wholepose = torch.linalg.norm(
        (pred0 - target_in[:, None, :PRED]).reshape(B, S, PRED, -1), dim=-1
    ).mean(-1)
    assert (perjoint.argmin(-1) != wholepose.argmin(-1)).any(), (
        "offsets failed to split the selection norms; regenerate with a new seed"
    )

    t_every, p_every, t_first, p_first = run_reference(
        skeleton, obs_in, target_in, offsets_in
    )

    # --- RescalePose golden: pins the reference's METRIC-space re-feed ---
    # (`eval_utils.py:63,95`).  Under RescalePose metric = input × BOX, so
    # every round ≥1 of the reference chain runs the predictor on an
    # observation inflated by BOX — exactly the behavior our
    # ``refeed_space='metric'`` compatibility mode must reproduce.
    skeleton_rs = create_skeleton(
        dataset_name="amass",
        motion_repr_type="SkeletonRescalePose",
        num_joints=J,
        pose_box_size=BOX,
        obs_length=N_PAST,
        pred_length=PRED,
        if_consider_hip=False,
    )
    probe_m = skeleton_rs.transform_to_metric_space(probe)
    assert torch.allclose(probe_m, probe * BOX), "RescalePose metric ≠ input×box?"
    t_every_rs, p_every_rs, t_first_rs, p_first_rs = run_reference(
        skeleton_rs, obs_in, target_in, offsets_in
    )
    # the inflation must actually bite (otherwise this golden pins nothing
    # beyond the CenterPose one): the chained predictions must NOT be the
    # CenterPose chain × BOX
    assert not torch.allclose(p_every_rs, p_every * BOX, atol=1e-4)
    assert not torch.allclose(p_first_rs, p_first * BOX, atol=1e-4)

    np.savez(
        os.path.join(OUT, "longterm.npz"),
        obs=obs, target=target, offsets=offsets,
        vel_scale_step=np.float32(VEL_SCALE_STEP),
        factor=np.float32(FACTOR), pred_length=np.int32(PRED),
        target_every=t_every.numpy(), pred_every=p_every.numpy(),
        target_first=t_first.numpy(), pred_first=p_first.numpy(),
        box=np.float32(BOX),
        target_every_rescale=t_every_rs.numpy(), pred_every_rescale=p_every_rs.numpy(),
        target_first_rescale=t_first_rs.numpy(), pred_first_rescale=p_first_rs.numpy(),
    )
    print("wrote goldens/longterm.npz",
          {k: v.shape for k, v in
           dict(te=t_every, pe=p_every, tf=t_first, pf=p_first,
                te_rs=t_every_rs, pe_rs=p_every_rs).items()})


if __name__ == "__main__":
    main()
