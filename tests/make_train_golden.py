"""Training-objective cross-implementation golden: drive the REFERENCE's
stage-1 and stage-2 training-loss compositions on shared weights and
injected noise, and record the outputs.

Run ONCE at test-authoring time (requires /root/reference mounted):

    python tests/make_train_golden.py

What it covers that the eval capstone (`make_capstone_golden.py`) doesn't:
the TRAINING objectives —

* stage 1: curriculum-sliced autoencode + L1 seq loss
  (`trainer.py:79-96`: ``autoencode(y[:, :ph], past=x, ph=ph)`` then
  ``ae.loss(pred, y[:, :ph])``) for several ``ph`` values, pinning both the
  reconstruction loss and our masked-loss/causal-encode equivalence;
* stage 2: frozen-AE embeddings → ``p_losses`` with injected white noise
  and fixed t (`base.py:262-300`) → k-fan-out similarity argmin in every
  ``similarity_space`` (`trainer.py:182-234``: ``to_comparison_space_train``
  + ``get_ksimilarity_loss``) → diff-weighted mean — the reference's OWN
  TrainerDiffusion methods, composed exactly as its ``loss()``.

The paired test is ``tests/test_train_objective_parity.py``.
"""
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# installs the ignite/hydra/denoising_diffusion_pytorch stubs and reference
# sys.path; reuses its tiny flagship-shaped configuration constants
import make_capstone_golden as cap  # noqa: E402

import torch  # noqa: E402

# src.core.trainer additionally imports ignite.engine, the ignite
# CosineAnnealingScheduler, and ema_pytorch — none exercised by the loss path
_ig_engine = types.ModuleType("ignite.engine")
_ig_engine.Engine = object
_ig_engine.Events = types.SimpleNamespace(
    EPOCH_STARTED=None, ITERATION_STARTED=None, ITERATION_COMPLETED=None,
    EPOCH_COMPLETED=None, COMPLETED=None,
)
_ig_contrib = types.ModuleType("ignite.contrib")
_ig_handlers = types.ModuleType("ignite.contrib.handlers")
_ig_handlers.CosineAnnealingScheduler = object
_ig_contrib.handlers = _ig_handlers
_ig_top_handlers = types.ModuleType("ignite.handlers")
_ig_top_handlers.create_lr_scheduler_with_warmup = lambda *a, **k: None
sys.modules["ignite"].engine = _ig_engine
sys.modules["ignite"].contrib = _ig_contrib
sys.modules["ignite"].handlers = _ig_top_handlers
for name, mod in (
    ("ignite.engine", _ig_engine),
    ("ignite.contrib", _ig_contrib),
    ("ignite.contrib.handlers", _ig_handlers),
    ("ignite.handlers", _ig_top_handlers),
    ("ema_pytorch", types.ModuleType("ema_pytorch")),
):
    sys.modules.setdefault(name, mod)
sys.modules["ema_pytorch"].EMA = object

from src.core.diffusion_manager import DiffusionManager  # noqa: E402
from src.core.network.nn import AutoEncoder  # noqa: E402
from src.core.trainer import TrainerDiffusion  # noqa: E402
from src.data.skeleton import create_skeleton  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "goldens")
OBS, PRED, J = cap.OBS, cap.PRED, cap.J
LATENT, HID, T_DIFF = cap.LATENT, cap.HID, cap.T_DIFF
POSE_BOX = cap.POSE_BOX
B, K = 4, 3


def main():
    torch.manual_seed(77)
    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose",
        num_joints=J, pose_box_size=POSE_BOX, obs_length=OBS,
        pred_length=PRED, if_consider_hip=False,
    )
    N = skeleton.num_nodes  # 21

    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=HID, decoder_hidden_size=HID,
        latent_size=LATENT, node_types=skeleton.nodes_type_id, input_size=3,
        z_activation="tanh", enc_num_layers=1, loss_pose_type="l1",
        output_size=3, if_consider_hip=False,
        recurrent_arch_enc="StaticGraphGRU",
        recurrent_arch_decoder="StaticGraphGRU",
    ).eval()

    manager = DiffusionManager(
        diffusion_type="NonisotropicGaussianDiffusion", skeleton=skeleton,
        covariance_matrix_type="adjacency", if_sigma_n_scale=True,
        sigma_n_scale="spectral", if_run_as_isotropic=False, num_nodes=N,
        node_types=skeleton.nodes_type_id, diffusion_conditioning=True,
        latent_size=LATENT, diffusion_timesteps=T_DIFF,
        diffusion_objective="pred_x0", beta_schedule="cosine",
        diffusion_covariance_type="skeleton-diffusion",
        gamma_scheduler="cosine", loss_reduction_type="l1",
        diffusion_activation="identity",
        diffusion_arch={
            "use_attention": True, "self_condition": False, "norm_type": "none",
            "depth": 2, "attn_dim_head": 8, "attn_heads": 2,
            "learn_influence": True,
        },
    )
    diffusion = manager.get_diffusion().eval()
    # snapshot NOW: the optimizer-trajectory section below mutates the
    # denoiser in place, and the loss goldens are computed with these weights
    den_sd0 = {k: v.detach().cpu().numpy().copy()
               for k, v in diffusion.model.state_dict().items()}

    # seed chosen so the k-best argmin picks a DIVERSE index per item in all
    # three similarity spaces (a degenerate all-zeros argmin would hide
    # gather/index bugs)
    rng = np.random.default_rng(9001)
    x = rng.standard_normal((B, OBS, N, 3)).astype(np.float32) * 0.3
    y = rng.standard_normal((B, PRED, N, 3)).astype(np.float32) * 0.3
    t = np.array([3, 0, 9, 5], dtype=np.int64)
    noise = rng.standard_normal((B * K, N, LATENT)).astype(np.float32)
    noise_k1 = np.ascontiguousarray(noise[::K])  # [B, N, LATENT]

    x_t = torch.from_numpy(x)
    y_t = torch.from_numpy(y)
    t_t = torch.from_numpy(t)

    golden = {"x": x, "y": y, "t": t, "noise": noise, "noise_k1": noise_k1}

    # ---- stage 1: curriculum-sliced autoencode + seq loss -------------------
    with torch.no_grad():
        for ph in (1, PRED // 2, PRED):
            pred, _, _ = ae.autoencode(y_t[:, :ph], past=x_t, ph=ph)
            loss = ae.loss(pred, y_t[:, :ph])
            golden[f"ae_pred_ph{ph}"] = pred.numpy()
            golden[f"ae_loss_ph{ph}"] = np.float64(loss.item())
            print(f"stage1 ph={ph}: loss={loss.item():.8f}")

    # ---- stage 2: frozen-AE embeddings (reference train_step, no_grad) ------
    with torch.no_grad():
        z_past_t, z_t = ae.get_train_embeddings(y_t, past=x_t, state=None)
    golden["z"] = z_t.numpy()
    golden["z_past"] = z_past_t.numpy()

    # a trainer instance carrying exactly the attributes the loss path uses
    # (the real __init__ builds Adam/EMA/ignite machinery irrelevant here)
    tr = TrainerDiffusion.__new__(TrainerDiffusion)
    tr.model = diffusion
    tr.skeleton = skeleton
    tr.config = {"prediction_horizon_eval": PRED}

    with torch.no_grad():
        for k in (1, K):
            n_inj = torch.from_numpy(noise_k1 if k == 1 else noise)
            loss_vec, diff_w, model_out = diffusion.p_losses(
                z_t, t_t, noise=n_inj, x_cond=z_past_t, n_train_samples=k
            )
            golden[f"plosses_vec_k{k}"] = loss_vec.numpy()
            golden[f"plosses_weights_k{k}"] = diff_w.numpy()
            golden[f"plosses_out_k{k}"] = model_out.numpy()
            for space in ("latent_space", "input_space", "metric_space"):
                tr.similarity_space = space
                tr.train_pick_best_sample_among_k = k
                if k > 1:
                    out_s, fut_s = tr.to_comparison_space_train(
                        model_out, diff_input=z_t, x_cond=z_past_t, space=space,
                        autoencoder=ae, past_seq=x_t, fut_seq=y_t,
                    )
                    sim_loss, idx = tr.get_ksimilarity_loss(
                        loss_vec, out_s, fut_s, autoencoder=ae
                    )
                    golden[f"argmin_k{k}_{space}"] = idx.numpy()
                else:
                    sim_loss = loss_vec
                final = (sim_loss * diff_w).mean()
                golden[f"train_loss_k{k}_{space}"] = np.float64(final.item())
                print(f"stage2 k={k} {space}: loss={final.item():.8f}")

    # ---- optimizer trajectories (3 steps each; reference train_step math:
    # backward → clip_grad_norm_(1.0) → step) ---------------------------------
    STEPS = 3
    CLIP2, CLIP1 = 0.02, 0.2
    t_steps = rng.integers(0, T_DIFF, size=(STEPS, B)).astype(np.int64)
    noise_steps = rng.standard_normal((STEPS, B * K, N, LATENT)).astype(np.float32)
    golden["opt_t_steps"] = t_steps
    golden["opt_noise_steps"] = noise_steps
    golden["opt_clip2"] = np.asarray(CLIP2)
    golden["opt_clip1"] = np.asarray(CLIP1)

    # stage 2: Adam β=(0.9,0.99), COUPLED weight decay 0.01 (torch Adam adds
    # wd·param to the grad inside step, i.e. post-clip), grad clip 1.0
    diffusion.train()
    opt = torch.optim.Adam(
        diffusion.model.parameters(), lr=1e-3, betas=(0.9, 0.99), weight_decay=0.01
    )
    tr.similarity_space = "input_space"
    tr.train_pick_best_sample_among_k = K
    step_losses, step_gnorms = [], []
    for s in range(STEPS):
        opt.zero_grad()
        loss_vec, diff_w, model_out = diffusion.p_losses(
            z_t, torch.from_numpy(t_steps[s]),
            noise=torch.from_numpy(noise_steps[s]),
            x_cond=z_past_t, n_train_samples=K,
        )
        out_s, fut_s = tr.to_comparison_space_train(
            model_out, diff_input=z_t, x_cond=z_past_t, space="input_space",
            autoencoder=ae, past_seq=x_t, fut_seq=y_t,
        )
        sim_loss, _ = tr.get_ksimilarity_loss(loss_vec, out_s, fut_s, autoencoder=ae)
        final = (sim_loss * diff_w).mean()
        final.backward()
        # clip threshold chosen BELOW the observed norms so the clip path is
        # actually exercised; the returned pre-clip global norm is itself a
        # gradient-parity pin (a scalar aggregate of EVERY gradient entry)
        gnorm = torch.nn.utils.clip_grad_norm_(diffusion.model.parameters(), CLIP2)
        opt.step()
        step_losses.append(final.item())
        step_gnorms.append(gnorm.item())
    golden["opt_step_losses"] = np.asarray(step_losses, dtype=np.float64)
    golden["opt_step_gnorms"] = np.asarray(step_gnorms, dtype=np.float64)
    for kk, v in diffusion.model.state_dict().items():
        golden[f"den_after.{kk}"] = v.detach().cpu().numpy()
    print("stage2 opt losses:", step_losses)
    diffusion.eval()

    # stage 1: AdamW(amsgrad, torch defaults wd=1e-2 β=(0.9,0.999)), clip 1.0,
    # fixed ph (reference trainer.py:33,93-94); reload untouched weights first
    ae2 = AutoEncoder(
        num_nodes=N, encoder_hidden_size=HID, decoder_hidden_size=HID,
        latent_size=LATENT, node_types=skeleton.nodes_type_id, input_size=3,
        z_activation="tanh", enc_num_layers=1, loss_pose_type="l1",
        output_size=3, if_consider_hip=False,
        recurrent_arch_enc="StaticGraphGRU",
        recurrent_arch_decoder="StaticGraphGRU",
    )
    ae2.load_state_dict(ae.state_dict())
    ae2.train()
    opt1 = torch.optim.AdamW(ae2.parameters(), lr=5e-3, amsgrad=True)
    PH_FIX = PRED // 2
    ae_step_losses, ae_step_gnorms = [], []
    for s in range(STEPS):
        opt1.zero_grad()
        pred, _, _ = ae2.autoencode(y_t[:, :PH_FIX], past=x_t, ph=PH_FIX)
        loss = ae2.loss(pred, y_t[:, :PH_FIX])
        loss.backward()
        gnorm = torch.nn.utils.clip_grad_norm_(ae2.parameters(), CLIP1)
        opt1.step()
        ae_step_losses.append(loss.item())
        ae_step_gnorms.append(gnorm.item())
    golden["ae_opt_step_losses"] = np.asarray(ae_step_losses, dtype=np.float64)
    golden["ae_opt_step_gnorms"] = np.asarray(ae_step_gnorms, dtype=np.float64)
    golden["ae_opt_ph"] = np.asarray(PH_FIX)
    for kk, v in ae2.state_dict().items():
        golden[f"ae_after.{kk}"] = v.detach().cpu().numpy()
    print("stage1 opt losses:", ae_step_losses)

    # covariance eigensystem: the injected q_sample noise is mixed through U,
    # so cross-implementation equality requires the same U on both sides
    # (same caveat as the eval capstone)
    golden["cov_Sigma_N"] = diffusion.Sigma_N.detach().cpu().numpy()
    golden["cov_Lambda_N"] = diffusion.Lambda_N.detach().cpu().numpy()
    golden["cov_U"] = diffusion.U.detach().cpu().numpy()
    for kk, v in ae.state_dict().items():
        golden[f"ae.{kk}"] = v.detach().cpu().numpy()
    for kk, v in den_sd0.items():
        golden[f"den.{kk}"] = v
    golden["config_json"] = np.array(
        json.dumps(dict(
            obs=OBS, pred=PRED, num_joints=J, latent=LATENT, hidden=HID,
            t_diff=T_DIFF, batch=B, k=K, pose_box=POSE_BOX,
        ))
    )

    np.savez(os.path.join(OUT, "train_objective.npz"), **golden)
    print("train golden written:", os.path.join(OUT, "train_objective.npz"))


if __name__ == "__main__":
    main()
