"""Training-objective cross-implementation parity: pin BOTH training losses
against the reference's own torch code on shared weights and injected noise
(`tests/make_train_golden.py` over `goldens/train_objective.npz`).

What this pins that the eval capstone doesn't:

* stage 1: our full-horizon masked loss + causal ``y_last_index`` encode
  equals the reference's literal ``autoencode(y[:, :ph], ph=ph)`` +
  ``ae.loss(pred, y[:, :ph])`` (`trainer.py:79-96`) for ph ∈ {1, mid, full};
* stage 2: frozen-AE train embeddings, ``p_losses`` (q_sample through the
  shared covariance eigensystem, Mahalanobis L1, loss weights), the
  k-fan-out similarity argmin in EVERY similarity_space, and the
  diff-weighted mean (`trainer.py:182-234` + `base.py:262-300`) — driven
  through OUR TrainerDiffusion.loss with the recorded t/noise.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "train_objective.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLD), reason="train-objective golden not generated"
)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLD, allow_pickle=False)


@pytest.fixture(scope="module")
def cfg(golden):
    return json.loads(str(golden["config_json"]))


@pytest.fixture(scope="module")
def skeleton(cfg):
    from skeletondiffusion_tpu.skeleton import create_skeleton

    return create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose",
        num_joints=cfg["num_joints"], pose_box_size=cfg["pose_box"],
        obs_length=cfg["obs"], pred_length=cfg["pred"], if_consider_hip=False,
    )


@pytest.fixture(scope="module")
def models(golden, cfg, skeleton):
    from skeletondiffusion_tpu.diffusion.manager import create_diffusion
    from skeletondiffusion_tpu.diffusion.process import build_nonisotropic_process
    from skeletondiffusion_tpu.models import AutoEncoder
    from skeletondiffusion_tpu.utils.torch_port import port_autoencoder, port_denoiser

    N = skeleton.num_nodes
    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=cfg["hidden"],
        decoder_hidden_size=cfg["hidden"], latent_size=cfg["latent"],
        node_types=skeleton.nodes_type_id,
    )
    ae_sd = {k[len("ae."):]: golden[k] for k in golden.files if k.startswith("ae.")}
    den_sd = {k[len("den."):]: golden[k] for k in golden.files if k.startswith("den.")}
    diffusion, _ = create_diffusion(
        skeleton,
        diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency",
        if_sigma_n_scale=True, sigma_n_scale="spectral",
        latent_size=cfg["latent"], diffusion_conditioning=True,
        diffusion_timesteps=cfg["t_diff"], diffusion_objective="pred_x0",
        beta_schedule="cosine", diffusion_covariance_type="skeleton-diffusion",
        gamma_scheduler="cosine", loss_reduction_type="l1",
        diffusion_activation="identity",
        diffusion_arch={
            "use_attention": True, "self_condition": False, "norm_type": "none",
            "depth": 2, "attn_dim_head": 8, "attn_heads": 2,
            "learn_influence": True,
        },
    )
    # same-U requirement as the eval capstone: injected q_sample noise is
    # mixed through U's column basis
    diffusion.process = build_nonisotropic_process(
        golden["cov_Sigma_N"], golden["cov_Lambda_N"], golden["cov_U"],
        timesteps=cfg["t_diff"], objective="pred_x0", beta_schedule="cosine",
        diffusion_covariance_type="skeleton-diffusion", gamma_scheduler="cosine",
        loss_reduction_type="l1",
    )
    return (
        ae, {"params": port_autoencoder(ae_sd)},
        diffusion, {"params": port_denoiser(den_sd, depth=2)},
    )


def test_stage1_curriculum_loss_matches_reference(golden, cfg, models):
    """Our full-horizon rollout + y_last_index causal encode + masked loss ≡
    the reference's sliced autoencode + seq loss, for every recorded ph."""
    from skeletondiffusion_tpu.models import AutoEncoder
    from skeletondiffusion_tpu.train.trainer_autoencoder import AutoEncoderTrainer

    ae, ae_params, _, _ = models
    x = jnp.asarray(golden["x"])
    y = jnp.asarray(golden["y"])
    tr = AutoEncoderTrainer(
        model=ae, lr=5e-3, iter_per_epoch=1,
        prediction_horizon_train=cfg["pred"], prediction_horizon_eval=cfg["pred"],
    )
    for ph in (1, cfg["pred"] // 2, cfg["pred"]):
        pred, _, _ = ae.apply(
            ae_params, y, x, ph=cfg["pred"], y_last_index=ph - 1,
            method=AutoEncoder.autoencode,
        )
        # the first ph frames of the full rollout equal the reference's
        # ph-length rollout (horizon-prefix property), and the masked loss
        # equals its loss on the slice
        np.testing.assert_allclose(
            np.asarray(pred[:, :ph]), golden[f"ae_pred_ph{ph}"],
            atol=2e-6, err_msg=f"ph={ph} rollout prefix",
        )
        loss = tr._masked_loss(pred, y, ph).mean()
        np.testing.assert_allclose(
            float(loss), float(golden[f"ae_loss_ph{ph}"]), rtol=1e-5,
            err_msg=f"ph={ph} loss",
        )


def test_stage2_embeddings_match_reference(golden, models):
    from skeletondiffusion_tpu.train.trainer_diffusion import TrainerDiffusion

    ae, ae_params, diffusion, dparams = models
    tr = TrainerDiffusion(
        diffusion, ae, ae_params, skeleton=None, if_use_ema=False,
        prediction_horizon_eval=int(golden["y"].shape[1]),
    )
    z_past, z = tr._embed(jnp.asarray(golden["x"]), jnp.asarray(golden["y"]))
    np.testing.assert_allclose(np.asarray(z), golden["z"], atol=2e-6)
    np.testing.assert_allclose(np.asarray(z_past), golden["z_past"], atol=2e-6)


@pytest.mark.parametrize("k", [1, 3])
@pytest.mark.parametrize(
    "space", ["latent_space", "input_space", "metric_space"]
)
def test_stage2_kbest_loss_matches_reference(golden, cfg, models, skeleton, k, space):
    """OUR TrainerDiffusion.loss (embeddings → p_losses → similarity argmin →
    diff-weighted mean) reproduces the reference's composed training loss for
    every (k, similarity_space) on shared weights + injected t/noise."""
    from skeletondiffusion_tpu.train.trainer_diffusion import TrainerDiffusion

    ae, ae_params, diffusion, dparams = models
    tr = TrainerDiffusion(
        diffusion, ae, ae_params,
        train_pick_best_sample_among_k=k, similarity_space=space,
        skeleton=skeleton, if_use_ema=False,
        prediction_horizon_eval=cfg["pred"],
    )
    x = jnp.asarray(golden["x"])
    y = jnp.asarray(golden["y"])
    z_past, z = tr._embed(x, y)
    noise = golden["noise"] if k == cfg["k"] else golden["noise_k1"]
    loss = tr.loss(
        dparams, jax.random.key(0), x, y, z, z_past,
        t=jnp.asarray(golden["t"]), noise=jnp.asarray(noise),
    )
    want = float(golden[f"train_loss_k{k}_{space}"])
    np.testing.assert_allclose(float(loss), want, rtol=2e-5,
                               err_msg=f"k={k} space={space}")
    # the per-sample loss vector and argmin indices agree too (seam check)
    lv, dw, out = diffusion.p_losses(
        dparams, jax.random.key(0), z, jnp.asarray(golden["t"]),
        x_cond=z_past, n_train_samples=k, noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(
        np.asarray(lv), golden[f"plosses_vec_k{k}"], rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dw), golden[f"plosses_weights_k{k}"], rtol=1e-5)
    if k > 1 and space != "latent_space":
        sim = tr._similarity(out, z, z_past, x, y)
        idx = np.asarray(jnp.argmin(sim, axis=-1))
        np.testing.assert_array_equal(idx, golden[f"argmin_k{k}_{space}"])


def _tree_to_arrays(params):
    import jax

    return {"/".join(map(str, p)): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(params)}


def test_stage2_optimizer_trajectory_matches_reference(golden, cfg, models, skeleton):
    """3 reference train steps (backward → clip_grad_norm → Adam with COUPLED
    L2) vs our optax chain on shared weights + injected t/noise: per-step
    losses and pre-clip global gradient norms (a scalar aggregate of every
    gradient entry = a direct gradient-parity pin) match tightly; final
    parameters match to optimizer-update scale."""
    import optax

    from skeletondiffusion_tpu.train.trainer_diffusion import TrainerDiffusion
    from skeletondiffusion_tpu.utils.torch_port import port_denoiser

    ae, ae_params, diffusion, dparams = models
    lr = 1e-3
    tr = TrainerDiffusion(
        diffusion, ae, ae_params,
        train_pick_best_sample_among_k=cfg["k"], similarity_space="input_space",
        skeleton=skeleton, if_use_ema=False, prediction_horizon_eval=cfg["pred"],
        lr=lr, weight_decay=0.01, adam_betas=(0.9, 0.99),
        max_grad_norm=float(golden["opt_clip2"]),
    )
    x, y = jnp.asarray(golden["x"]), jnp.asarray(golden["y"])
    z_past, z = tr._embed(x, y)
    params = jax.tree.map(jnp.asarray, dparams)
    opt_state = tr.tx.init(params)
    for s in range(golden["opt_t_steps"].shape[0]):
        t_s = jnp.asarray(golden["opt_t_steps"][s])
        n_s = jnp.asarray(golden["opt_noise_steps"][s])

        def loss_fn(p):
            return tr.loss(p, jax.random.key(0), x, y, z, z_past, t=t_s, noise=n_s)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(
            float(loss), golden["opt_step_losses"][s], rtol=5e-4,
            err_msg=f"step {s} loss")
        np.testing.assert_allclose(
            float(optax.global_norm(grads)), golden["opt_step_gnorms"][s],
            rtol=1e-3, err_msg=f"step {s} grad norm")
        updates, opt_state = tr.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, jax.tree.map(lambda u: -lr * u, updates))

    want = _tree_to_arrays({"params": port_denoiser(
        {k[len("den_after."):]: golden[k] for k in golden.files
         if k.startswith("den_after.")}, depth=2)})
    got = _tree_to_arrays(params)
    assert want.keys() == got.keys()
    for name in want:
        np.testing.assert_allclose(
            got[name], want[name], atol=3 * lr, rtol=0,
            err_msg=f"param {name} after 3 steps")


def test_stage1_optimizer_trajectory_matches_reference(golden, cfg, models):
    """3 reference stage-1 steps (sliced autoencode → L1 → clip → AdamW
    amsgrad, DECOUPLED decay) vs our masked-loss step math — also proves the
    masked/full-rollout formulation has the SAME GRADIENTS as the
    reference's literal slicing, not just the same loss value."""
    import optax

    from skeletondiffusion_tpu.models import AutoEncoder
    from skeletondiffusion_tpu.train.trainer_autoencoder import AutoEncoderTrainer
    from skeletondiffusion_tpu.utils.torch_port import port_autoencoder

    ae, ae_params, _, _ = models
    lr = 5e-3
    ph = int(golden["ae_opt_ph"])
    tr = AutoEncoderTrainer(
        model=ae, lr=lr, iter_per_epoch=1,
        prediction_horizon_train=cfg["pred"], prediction_horizon_eval=cfg["pred"],
        clip_grad_norm=float(golden["opt_clip1"]),
    )
    x, y = jnp.asarray(golden["x"]), jnp.asarray(golden["y"])
    params = jax.tree.map(jnp.asarray, ae_params)
    opt_state = tr.tx.init(params)
    for s in range(int(golden["ae_opt_step_losses"].shape[0])):
        def loss_fn(p):
            pred, _, _ = ae.apply(
                p, y, x, ph=cfg["pred"], y_last_index=ph - 1,
                method=AutoEncoder.autoencode,
            )
            return tr._masked_loss(pred, y, ph).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(
            float(loss), golden["ae_opt_step_losses"][s], rtol=5e-4,
            err_msg=f"step {s} loss")
        np.testing.assert_allclose(
            float(optax.global_norm(grads)), golden["ae_opt_step_gnorms"][s],
            rtol=1e-3, err_msg=f"step {s} grad norm")
        updates, opt_state = tr.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, jax.tree.map(lambda u: -lr * u, updates))

    want = _tree_to_arrays({"params": port_autoencoder(
        {k[len("ae_after."):]: golden[k] for k in golden.files
         if k.startswith("ae_after.")})})
    got = _tree_to_arrays(params)
    assert want.keys() == got.keys()
    for name in want:
        np.testing.assert_allclose(
            got[name], want[name], atol=3 * lr, rtol=0,
            err_msg=f"param {name} after 3 steps")
