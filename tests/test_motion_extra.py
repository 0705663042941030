"""DCT representation parity vs the reference implementation and config-tree
value equivalence with the reference's yaml trees."""
import os

import numpy as np
import pytest
import yaml

from skeletondiffusion_tpu.skeleton import create_skeleton
from skeletondiffusion_tpu.skeleton.motion import get_dct_matrix

REF = "/root/reference"


def test_dct_matrix_matches_reference_formula():
    dct, idct = get_dct_matrix(16)
    # orthonormal DCT-II: M Mᵀ = I and inverse = transpose (up to fp error)
    np.testing.assert_allclose(dct @ dct.T, np.eye(16), atol=1e-10)
    np.testing.assert_allclose(idct, dct.T, atol=1e-10)
    # reference closed form `dct.py:6-14`
    N = 16
    ref = np.eye(N)
    for k in range(N):
        for i in range(N):
            w = np.sqrt(2 / N) if k else np.sqrt(1 / N)
            ref[k, i] = w * np.cos(np.pi * (i + 0.5) * k / N)
    np.testing.assert_allclose(dct, ref, atol=1e-12)


def test_dct_roundtrip_through_skeleton(rng):
    sk = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonDiscreteCosineTransform",
        num_joints=22, obs_length=6, pred_length=10, if_consider_hip=False,
    )
    data = rng.standard_normal((2, 16, 22, 3)).astype(np.float32) * 0.3
    x = np.asarray(sk.tranform_to_input_space(data))
    assert x.shape == (2, 16, 21, 3)
    fut_coeffs = x[:, 6:]
    back = np.asarray(sk.transform_to_metric_space(fut_coeffs))
    # inverse DCT of the future segment reproduces the centered poses
    centered = data - data[:, :, 0:1, :]
    np.testing.assert_allclose(back, centered[:, 6:, 1:, :], atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_config_values_match_reference_yamls():
    """The 1:1 config-translation claim: raw values in our group yamls equal
    the reference's (for keys that are plain literals upstream)."""

    def load(path):
        with open(path) as f:
            return yaml.safe_load(f)

    pairs = [
        ("configs/config_train_autoencoder/dataset/amass.yaml",
         f"{REF}/configs/config_train_autoencoder/dataset/amass.yaml",
         ["num_joints", "fps", "multimodal_threshold", "dataset_type", "dataset_name",
          "data_loader_train"]),
        ("configs/config_train_autoencoder/task/hmp.yaml",
         f"{REF}/configs/config_train_autoencoder/task/hmp.yaml",
         ["if_consider_hip", "history_sec", "prediction_horizon_sec",
          "motion_repr_type", "pose_box_size", "seq_centering"]),
        ("configs/config_train_diffusion/model/skeleton_diffusion.yaml",
         f"{REF}/configs/config_train_diffusion/model/skeleton_diffusion.yaml",
         ["lr", "diffusion_objective", "diffusion_timesteps", "diffusion_type",
          "train_pick_best_sample_among_k", "similarity_space", "beta_schedule",
          "gamma_scheduler", "diffusion_covariance_type", "sigma_n_scale",
          "diffusion_arch", "num_epochs", "batch_size", "seed",
          "step_start_ema", "ema_update_every", "ema_min_value"]),
    ]
    for ours_path, ref_path, keys in pairs:
        ours, ref = load(ours_path), load(ref_path)
        for k in keys:
            assert ours[k] == ref[k], (ours_path, k, ours[k], ref[k])


def test_plot_stack_renders(tmp_path):
    """Visualization stack: grid animation (obs→GT+preds), frame rendering,
    gif/img IO, keypoint helpers (reference `src/utils/{plot,plot_parallel,
    image,keypoints}.py`)."""
    import numpy as np

    from skeletondiffusion_tpu.skeleton import create_skeleton
    from skeletondiffusion_tpu.utils.keypoints import (
        center_kpts_around_hip,
        center_kpts_around_hip_and_drop_root,
        rotate_y_axis,
    )
    from skeletondiffusion_tpu.utils.plot import (
        animate_prediction_grid,
        load_image,
        render_motion_frames,
        save_gif,
        save_img,
    )

    sk = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=3, pred_length=4, if_consider_hip=True,
    )
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((3, 22, 3)) * 0.2
    target = rng.standard_normal((4, 22, 3)) * 0.2
    preds = [rng.standard_normal((4, 22, 3)) * 0.2 for _ in range(2)]

    out = animate_prediction_grid(obs, target, preds, sk,
                                  titles=["closest", "diverse"],
                                  out_path=str(tmp_path / "grid.gif"), fps=5)
    import os
    assert os.path.getsize(out) > 0

    frames = render_motion_frames(target, sk.get_limbseq(),
                                  getattr(sk, "left_right_limb", None),
                                  overlay=preds[0], title="t")
    assert frames.shape[0] == 4 and frames.shape[-1] == 3 and frames.dtype == np.uint8

    gif = save_gif(frames, fps=5, name=str(tmp_path / "f.gif"))
    assert os.path.getsize(gif) > 0
    img = save_img(frames[0], str(tmp_path / "f0.png"))
    loaded = load_image(img)
    assert loaded.shape[:2] == frames[0].shape[:2]

    centered, hip = center_kpts_around_hip(obs)
    assert np.allclose(centered[..., 0, :], 0)
    body = center_kpts_around_hip_and_drop_root(obs)
    assert body.shape == (3, 21, 3)
    rot = rotate_y_axis(obs, 180.0)
    np.testing.assert_allclose(rot[..., 1], obs[..., 1], atol=1e-12)  # y preserved
    np.testing.assert_allclose(rotate_y_axis(rot, 180.0), obs, atol=1e-12)


def test_parallel_grid_rendering(tmp_path):
    """render_prediction_grids_parallel writes one animation per job
    (reference `src/utils/plot_parallel.py` fan-out); n_workers=1 exercises
    the serial fallback without spawning processes."""
    import os

    import numpy as np

    from skeletondiffusion_tpu.skeleton import create_skeleton
    from skeletondiffusion_tpu.utils.plot import render_prediction_grids_parallel

    sk = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose", num_joints=22,
        pose_box_size=1.5, obs_length=3, pred_length=4, if_consider_hip=False,
    )
    rng = np.random.default_rng(0)
    J = sk.num_nodes + 1
    mk = lambda T: rng.standard_normal((T, J, 3)) * 0.2
    jobs = [
        {"obs": mk(3), "target": mk(4), "preds": [mk(4), mk(4)],
         "out_path": str(tmp_path / f"g{i}.gif")}
        for i in range(2)
    ]
    paths = render_prediction_grids_parallel(jobs, sk, n_workers=1, fps=5)
    assert len(paths) == 2 and all(os.path.getsize(p) > 0 for p in paths)


def test_shipped_example_observations():
    """The packaged demo inputs (datasets/examples/*.npy, same artifacts the
    reference notebooks load) have the documented shape and flow through the
    input-space transform for both the 22-joint body and 52-joint MANO
    skeletons."""
    import os

    import numpy as np

    from skeletondiffusion_tpu.skeleton import create_skeleton

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, num_joints in (("amass", 22), ("amass-mano", 52)):
        path = os.path.join(here, "datasets", "examples", f"example_obs_{name}.npy")
        obs = np.load(path)
        assert obs.shape == (1, 30, 52, 3) and np.isfinite(obs).all()
        # meters, root included: plausible human scale
        extent = obs.max(axis=(0, 1, 2)) - obs.min(axis=(0, 1, 2))
        assert (extent < 5.0).all() and (extent > 0.05).any()
        sk = create_skeleton(
            dataset_name="amass", motion_repr_type="SkeletonRescalePose",
            num_joints=num_joints, pose_box_size=1.5, obs_length=30,
            pred_length=120, if_consider_hip=False,
        )
        x = obs[:, :, :num_joints].astype(np.float32)
        inp = sk.tranform_to_input_space(x)
        assert inp.shape == (1, 30, sk.num_nodes, 3)
