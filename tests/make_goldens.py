"""Generate golden-value fixtures from the reference implementation.

Run ONCE at test-authoring time (requires /root/reference mounted):

    python tests/make_goldens.py

Produces ``tests/goldens/*.npz`` holding the reference's diffusion tables and
q_sample/q_posterior/loss outputs on fixed inputs, which the unit tests pin
the JAX implementation against (SURVEY.md §4 test strategy, item (b)).
Only numeric outputs are extracted — no reference code is copied.
"""
import os
import sys

import numpy as np

REF = "/root/reference"
sys.path.insert(0, os.path.join(REF, "src"))
OUT = os.path.join(os.path.dirname(__file__), "goldens")
os.makedirs(OUT, exist_ok=True)

import torch  # noqa: E402

torch.manual_seed(0)

# The reference's package __init__ imports its Denoiser, which depends on the
# external denoising_diffusion_pytorch package (absent here).  Stub the two
# symbols it imports so the diffusion modules load; they are unused by the
# table/maths extraction below.
import types  # noqa: E402

import math  # noqa: E402


class _SinusoidalPosEmb(torch.nn.Module):
    """Functional stand-in for lucidrains' SinusoidalPosEmb (standard
    transformer sinusoidal embedding over scalar timesteps)."""

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
sys.modules.setdefault("denoising_diffusion_pytorch.denoising_diffusion_pytorch_1d", _ddp1d)

from core.diffusion.base import cosine_beta_schedule, linear_beta_schedule, exp_beta_schedule  # noqa: E402
from core.diffusion.utils import get_cov_from_corr  # noqa: E402
from core.diffusion.nonisotropic import NonisotropicGaussianDiffusion  # noqa: E402
from core.diffusion.isotropic import IsotropicGaussianDiffusion  # noqa: E402
from data.skeleton import create_skeleton  # noqa: E402


class DummyModel(torch.nn.Module):
    """Minimal stand-in so LatentDiffusion.__init__ accepts it."""

    def __init__(self, channels):
        super().__init__()
        self.channels = channels
        self.self_condition = False

    def forward(self, x, t, x_self_cond=None, x_cond=None):
        return x * 0.5


def np64(t):
    return t.detach().cpu().numpy().astype(np.float64)


def main():
    T = 10
    # --- beta schedules -----------------------------------------------------
    np.savez(
        os.path.join(OUT, "schedules.npz"),
        cosine_T10=np64(cosine_beta_schedule(10)),
        linear_T10=np64(linear_beta_schedule(10)),
        exp_T10=np64(exp_beta_schedule(10, 3.0)),
        cosine_T50=np64(cosine_beta_schedule(50)),
    )

    # --- covariance from AMASS adjacency ------------------------------------
    sk = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=30, pred_length=120, if_consider_hip=False,
    )
    corr = sk.adj_matrix
    Sigma_N, Lambda_N, U = get_cov_from_corr(
        correlation_matrix=corr, if_sigma_n_scale=True, sigma_n_scale="spectral",
        if_run_as_isotropic=False,
    )
    np.savez(
        os.path.join(OUT, "cov_amass.npz"),
        corr=np64(corr), Sigma_N=np64(Sigma_N), Lambda_N=np64(Lambda_N), U=np64(U),
    )

    # --- nonisotropic diffusion buffers + transforms ------------------------
    N = Sigma_N.shape[0]
    model = DummyModel(channels=N)
    diff = NonisotropicGaussianDiffusion(
        Sigma_N=Sigma_N, Lambda_N=Lambda_N, U=U, model=model,
        diffusion_covariance_type="skeleton-diffusion", gamma_scheduler="cosine",
        loss_reduction_type="l1", latent_size=96, diffusion_timesteps=T,
        diffusion_objective="pred_x0", beta_schedule="cosine",
        diffusion_conditioning=False, diffusion_activation="identity",
    )
    rng = np.random.default_rng(42)
    B = 4
    x0 = rng.standard_normal((B, N, 96)).astype(np.float32)
    xt = rng.standard_normal((B, N, 96)).astype(np.float32)
    noise = rng.standard_normal((B, N, 96)).astype(np.float32)
    t = np.array([0, 3, 7, 9], dtype=np.int64)

    tt, tx0, txt, tnoise = map(torch.tensor, (t, x0, xt, noise))
    q = diff.q_sample(tx0, tt, noise=tnoise)
    pm, pv, plv = diff.q_posterior(tx0, txt, tt)
    loss_el = diff.loss_funct(txt, tx0, tt)  # model_out=xt, target=x0
    pred_noise = diff.predict_noise_from_start(txt, tt, tx0)
    combined = diff.p_combine_mean_var_noise(pm, plv, tnoise)

    buffers = {k: np64(v) for k, v in diff.named_buffers()}
    np.savez(
        os.path.join(OUT, "noniso_amass.npz"),
        x0=x0, xt=xt, noise=noise, t=t,
        q_sample=np64(q), post_mean=np64(pm), post_var=np64(pv), post_logvar=np64(plv),
        loss_el=np64(loss_el), pred_noise=np64(pred_noise), combined=np64(combined),
        **buffers,
    )

    # --- isotropic diffusion buffers ---------------------------------------
    idiff = IsotropicGaussianDiffusion(
        model=model, latent_size=96, diffusion_timesteps=T,
        diffusion_objective="pred_x0", beta_schedule="cosine",
        diffusion_conditioning=False, diffusion_activation="identity",
        diffusion_loss_type="mse",
    )
    qi = idiff.q_sample(tx0, tt, noise=tnoise)
    pmi, pvi, plvi = idiff.q_posterior(tx0, txt, tt)
    ibuffers = {k: np64(v) for k, v in idiff.named_buffers()}
    np.savez(
        os.path.join(OUT, "iso.npz"),
        x0=x0, xt=xt, noise=noise, t=t,
        q_sample=np64(qi), post_mean=np64(pmi), post_var=np64(pvi), post_logvar=np64(plvi),
        **ibuffers,
    )

    # --- README toy: random 16-node correlation ------------------------------
    rng16 = np.random.default_rng(7)
    corr16 = rng16.uniform(0, 1, (16, 16))
    corr16 = (corr16 + corr16.T) / 2
    np.fill_diagonal(corr16, 0.0)
    S16, L16, U16 = get_cov_from_corr(
        correlation_matrix=torch.tensor(corr16, dtype=torch.float32),
        if_sigma_n_scale=True, sigma_n_scale="spectral", if_run_as_isotropic=False,
    )
    np.savez(
        os.path.join(OUT, "cov_toy16.npz"),
        corr=corr16, Sigma_N=np64(S16), Lambda_N=np64(L16), U=np64(U16),
    )
    # --- network forward parity: Denoiser + AutoEncoder ----------------------
    from core.network import Denoiser  # noqa: E402
    from core.network.nn import AutoEncoder  # noqa: E402

    node_types = sk.nodes_type_id
    den = Denoiser(
        dim=96, cond_dim=96, out_dim=96, channels=N, num_nodes=N, node_types=node_types,
        use_attention=True, self_condition=False, norm_type="none", depth=4,
        attn_dim_head=32, attn_heads=8, learn_influence=True,
    ).eval()
    xb = torch.tensor(rng.standard_normal((3, N, 96)).astype(np.float32))
    tb = torch.tensor([0, 4, 9], dtype=torch.long)
    cb = torch.tensor(rng.standard_normal((3, N, 96)).astype(np.float32))
    with torch.no_grad():
        den_out = den(xb, tb, None, cb)
    np.savez(
        os.path.join(OUT, "denoiser_fwd.npz"),
        x=xb.numpy(), t=tb.numpy(), cond=cb.numpy(), out=np64(den_out),
        **{k: np64(v) for k, v in den.state_dict().items()},
    )

    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=96, decoder_hidden_size=96, latent_size=96,
        node_types=node_types, input_size=3, z_activation="tanh", enc_num_layers=1,
        loss_pose_type="l1", output_size=3, if_consider_hip=False,
        recurrent_arch_enc="StaticGraphGRU", recurrent_arch_decoder="StaticGraphGRU",
    ).eval()
    past = torch.tensor(rng.standard_normal((3, 30, N, 3)).astype(np.float32)) * 0.3
    fut = torch.tensor(rng.standard_normal((3, 24, N, 3)).astype(np.float32)) * 0.3
    with torch.no_grad():
        out, z_past, z = ae.autoencode(fut, past, ph=24)
        dec = ae.decode(past, z, z_past, ph=24)
        loss_none = ae.loss(out, fut, reduction="none")
    np.savez(
        os.path.join(OUT, "autoencoder_fwd.npz"),
        past=past.numpy(), fut=fut.numpy(), out=np64(out), z_past=np64(z_past),
        z=np64(z), dec=np64(dec), loss_none=np64(loss_none),
        **{k: np64(v) for k, v in ae.state_dict().items()},
    )

    # --- metric goldens -------------------------------------------------------
    from metrics.multimodal import ade as r_ade, fde as r_fde, apd as r_apd, mae as r_mae, \
        mmade as r_mmade, mmfde as r_mmfde, lat_apd as r_lat_apd, mpjpe as r_mpjpe
    from metrics.body_realism import (
        limb_stretching_normed_mean as r_lsm, limb_stretching_normed_rmse as r_lsr,
        limb_jitter_normed_mean as r_ljm, limb_jitter_normed_rmse as r_ljr,
        limb_length_error as r_lle, limb_length_variance as r_llv,
    )

    B, S, T_, J = 4, 6, 10, N
    pred = torch.tensor(rng.standard_normal((B, S, T_, J, 3)).astype(np.float32)) * 0.3 + 1.0
    targ = torch.tensor(rng.standard_normal((B, T_, J, 3)).astype(np.float32)) * 0.3 + 1.0
    mm_counts = [2, 5, 1, 3]
    mm_list = [
        torch.tensor(rng.standard_normal((m, T_, J, 3)).astype(np.float32)) * 0.3 + 1.0
        for m in mm_counts
    ]
    limbseq = sk.get_limbseq()
    lai = sk.limb_angles_idx
    gold = dict(
        pred=pred.numpy(), target=targ.numpy(), mm_counts=np.asarray(mm_counts),
        mm_flat=np.concatenate([m.numpy() for m in mm_list], axis=0),
        ade=np64(r_ade(targ, pred)), fde=np64(r_fde(targ, pred)), apd=np64(r_apd(pred)),
        mpjpe=np64(r_mpjpe(targ, pred)),
        mae=np64(r_mae(targ, pred, limbseq=limbseq.copy(), limb_angles_idx=lai)),
        mmade=np64(r_mmade(targ, pred, mm_list)), mmfde=np64(r_mmfde(targ, pred, mm_list)),
        lat_apd=np64(r_lat_apd(pred.reshape(B, S, -1))),
        stretch_mean=np64(r_lsm(pred, targ, limbseq=limbseq)),
        stretch_rmse=np64(r_lsr(pred, targ, limbseq=limbseq)),
        jitter_mean=np64(r_ljm(pred, targ, limbseq=limbseq)),
        jitter_rmse=np64(r_ljr(pred, targ, limbseq=limbseq)),
        limb_err=np64(r_lle(targ, pred, limbseq=limbseq)),
        limb_var=np64(r_llv(pred, limbseq=limbseq)),
    )
    np.savez(os.path.join(OUT, "metrics.npz"), **gold)

    # --- FID classifier (2-layer torch nn.GRU + heads) ----------------------
    from metrics.fid_classifier import ClassifierForFID  # noqa: E402

    clf = ClassifierForFID(input_size=48, hidden_size=128, hidden_layer=2,
                           output_size=15, device="cpu").eval()
    motion = torch.tensor(rng.standard_normal((3, 48, 25)).astype(np.float32))
    h0 = torch.zeros(2, 3, 128)
    with torch.no_grad():
        feats = clf.get_fid_features(motion, hidden_unit=h0)
        logits = clf(motion, hidden_unit=h0)
    np.savez(
        os.path.join(OUT, "fid_classifier.npz"),
        motion=motion.numpy(), feats=np64(feats), logits=np64(logits),
        **{k: np64(v) for k, v in clf.state_dict().items()},
    )

    # --- skeleton tables for ALL datasets (non-AMASS parity evidence) --------
    # adjacency / reachability / node types / limbseqs / limb_angles_idx for
    # every kinematic the reference ships (`kinematic/{amass,h36m,freeman}.py`)
    import json as _json

    tables = {}
    for name, dataset_name, num_joints, hip in (
        ("amass22", "amass", 22, False),
        ("amass52", "amass-mano", 52, False),
        ("h36m17", "h36m", 17, False),
        # the 25-joint H36M variant only exists with the hip kept
        # (`h36m.py:98` asserts num_joints == 17 in the no-hip branch)
        ("h36m25", "h36m", 25, True),
        ("freeman18", "freeman", 18, False),
    ):
        skd = create_skeleton(
            dataset_name=dataset_name, motion_repr_type="SkeletonRescalePose",
            num_joints=num_joints, pose_box_size=1.5, obs_length=30,
            pred_length=120, if_consider_hip=hip,
        )
        tables[f"{name}_adj"] = np64(skd.adj_matrix)
        tables[f"{name}_reach"] = np64(skd.reachability_matrix(factor=0.5, stop_at="hips"))
        tables[f"{name}_node_types"] = skd.nodes_type_id.numpy().astype(np.int64)
        tables[f"{name}_limbseq"] = np.asarray(skd.get_limbseq(), dtype=np.int64)
        tables[f"{name}_metric_limbseq"] = np.asarray(skd.limbseq, dtype=np.int64)
        tables[f"{name}_left_right"] = np.asarray(skd.left_right_limb, dtype=bool)
        tables[f"{name}_limb_angles_idx"] = np.array(
            _json.dumps([list(r) for r in getattr(skd, "limb_angles_idx", [])])
        )
        tables[f"{name}_num_nodes"] = np.asarray(skd.num_nodes)
    from data.skeleton.kinematic.h36m import CONVERSION_IDX_H36M_32TO17, CONVERSION_IDX_H36M_32TO25  # noqa: E402

    tables["h36m_conv_32to17"] = np.asarray(CONVERSION_IDX_H36M_32TO17, dtype=np.int64)
    tables["h36m_conv_32to25"] = np.asarray(CONVERSION_IDX_H36M_32TO25, dtype=np.int64)
    np.savez(os.path.join(OUT, "skeleton_tables.npz"), **tables)

    print("goldens written to", OUT)


if __name__ == "__main__":
    main()
