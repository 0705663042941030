"""Long-term recursion parity + invariants.

``goldens/longterm.npz`` (see ``make_longterm_golden.py``) holds the outputs
of the REFERENCE's own ``long_term_prediction_best_every50`` /
``best_first50`` (`src/eval_utils.py:44-99`) driven with a closed-form
deterministic predictor at factor 2.5 — covering the per-round target
slicing, the fractional ``keep`` truncation, the per-joint best-sample
selection norm (`metrics/utils.py:22-30`), the feedback chain, and the final
concat/repeat.  The first tests reproduce the same run through OUR
implementations and pin the results.

The remaining tests check semantics the golden can't: metric-space outputs
with a non-identity transform (RescalePose), input-space feedback (our
documented divergence from the reference's metric-space re-feed), and the
per-sample autoregressive chain of ``best_first50``.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeletondiffusion_tpu.eval_pipeline import (
    long_term_prediction_best_every50,
    long_term_prediction_best_first50,
)
from skeletondiffusion_tpu.metrics import ade, best_sample_index
from skeletondiffusion_tpu.skeleton import create_skeleton

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "longterm.npz")


def make_fake_predictor(offsets, vel_scale_step, default_samples):
    """JAX twin of make_longterm_golden.py::fake_get_prediction."""
    offsets = jnp.asarray(offsets)

    def predictor(rng, obs, num_samples=None, pred_length=None):
        S = num_samples or default_samples
        vel = obs[:, -1] - obs[:, -2]
        last = obs[:, -1]
        t = jnp.arange(1, pred_length + 1, dtype=obs.dtype)
        scale = 1.0 + vel_scale_step * jnp.arange(S, dtype=obs.dtype)
        pred = (
            last[:, None, None]
            + vel[:, None, None] * t[None, None, :, None, None]
            * scale[None, :, None, None, None]
            + offsets[None, :S, None]
        )
        return pred, None

    return predictor


@pytest.fixture(scope="module")
def golden():
    g = np.load(GOLD)
    pred_length = int(g["pred_length"])
    factor = float(g["factor"])
    obs = g["obs"][..., 1:, :]  # if_consider_hip=False drops the hip joint
    target = g["target"][..., 1:, :]
    offsets = g["offsets"][..., 1:, :]
    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonCenterPose",
        num_joints=g["obs"].shape[-2], obs_length=obs.shape[1],
        pred_length=pred_length, if_consider_hip=False,
    )
    predictor = make_fake_predictor(
        offsets, float(g["vel_scale_step"]), g["pred_every"].shape[1]
    )
    return g, skeleton, predictor, jnp.asarray(obs), jnp.asarray(target), pred_length, factor


def test_selection_norms_disagree_on_golden_data(golden):
    """The golden data is constructed so the reference's per-joint selection
    norm and the ADE whole-pose norm pick DIFFERENT samples — i.e. this
    golden would catch an implementation that selects by ADE."""
    g, skeleton, predictor, obs, target, pred_length, _ = golden
    pred, _ = predictor(jax.random.key(0), obs, pred_length=pred_length)
    tgt = target[:, :pred_length]
    per_joint = best_sample_index(pred, tgt)
    whole_pose = jnp.argmin(ade(tgt, pred, reduction="none"), axis=-1)
    assert (np.asarray(per_joint) != np.asarray(whole_pose)).any()


def test_best_every50_matches_reference(golden):
    g, skeleton, predictor, obs, target, pred_length, factor = golden
    target_m, pred_m = long_term_prediction_best_every50(
        predictor, skeleton, jax.random.key(0), obs, target,
        num_samples=g["pred_every"].shape[1], pred_length=pred_length,
        long_term_factor=factor,
    )
    np.testing.assert_allclose(np.asarray(target_m), g["target_every"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred_m), g["pred_every"], atol=1e-5)


def test_best_first50_matches_reference(golden):
    g, skeleton, predictor, obs, target, pred_length, factor = golden
    target_m, pred_m = long_term_prediction_best_first50(
        predictor, skeleton, jax.random.key(0), obs, target,
        num_samples=g["pred_first"].shape[1], pred_length=pred_length,
        long_term_factor=factor,
    )
    np.testing.assert_allclose(np.asarray(target_m), g["target_first"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred_m), g["pred_first"], atol=1e-5)


@pytest.fixture(scope="module")
def golden_rescale():
    """Same driver data under RescalePose: pins the reference's EXACT
    metric-space re-feed semantics (`eval_utils.py:63,95`) where the
    inflation by pose_box_size actually bites (VERDICT r3 missing #3)."""
    g = np.load(GOLD)
    pred_length = int(g["pred_length"])
    factor = float(g["factor"])
    obs = g["obs"][..., 1:, :]
    target = g["target"][..., 1:, :]
    offsets = g["offsets"][..., 1:, :]
    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose",
        num_joints=g["obs"].shape[-2], pose_box_size=float(g["box"]),
        obs_length=obs.shape[1], pred_length=pred_length, if_consider_hip=False,
    )
    predictor = make_fake_predictor(
        offsets, float(g["vel_scale_step"]), g["pred_every_rescale"].shape[1]
    )
    return g, skeleton, predictor, jnp.asarray(obs), jnp.asarray(target), pred_length, factor


@pytest.mark.parametrize("fn,tkey,pkey", [
    (long_term_prediction_best_every50, "target_every_rescale", "pred_every_rescale"),
    (long_term_prediction_best_first50, "target_first_rescale", "pred_first_rescale"),
], ids=["best_every50", "best_first50"])
def test_metric_refeed_matches_reference_rescalepose(golden_rescale, fn, tkey, pkey):
    """``refeed_space='metric'`` reproduces the reference's RescalePose
    long-term chain bit-for-bit — the compatibility mode that makes AMASS
    if_long_term_test numbers diffable against the reference."""
    g, skeleton, predictor, obs, target, pred_length, factor = golden_rescale
    target_m, pred_m = fn(
        predictor, skeleton, jax.random.key(0), obs, target,
        num_samples=g[pkey].shape[1], pred_length=pred_length,
        long_term_factor=factor, refeed_space="metric",
    )
    np.testing.assert_allclose(np.asarray(target_m), g[tkey], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred_m), g[pkey], atol=1e-5)


@pytest.mark.parametrize("fn,pkey", [
    (long_term_prediction_best_every50, "pred_every_rescale"),
    (long_term_prediction_best_first50, "pred_first_rescale"),
], ids=["best_every50", "best_first50"])
def test_input_refeed_diverges_from_reference_rescalepose(golden_rescale, fn, pkey):
    """The default ``refeed_space='input'`` (bug-fixed) must NOT reproduce
    the reference's inflated RescalePose chain — i.e. the flag genuinely
    switches semantics, and the divergence documented in PARITY.md is real."""
    g, skeleton, predictor, obs, target, pred_length, factor = golden_rescale
    _, pred_m = fn(
        predictor, skeleton, jax.random.key(0), obs, target,
        num_samples=g[pkey].shape[1], pred_length=pred_length,
        long_term_factor=factor, refeed_space="input",
    )
    assert not np.allclose(np.asarray(pred_m), g[pkey], atol=1e-4)


# ---------------------------------------------------------------------------
# Semantics beyond the golden configuration
# ---------------------------------------------------------------------------

B, S, N_PAST, PRED, J = 2, 3, 4, 6, 22
BOX = 1.5


@pytest.fixture(scope="module")
def rescale_env():
    skeleton = create_skeleton(
        dataset_name="amass", motion_repr_type="SkeletonRescalePose",
        num_joints=J, pose_box_size=BOX, obs_length=N_PAST,
        pred_length=PRED, if_consider_hip=False,
    )
    rng = np.random.default_rng(3)
    # observation = clean linear ramp (base + w·t) so velocity-continuing
    # predictions chain into closed-form ramps
    base = rng.standard_normal((B, 1, J - 1, 3)).astype(np.float32) * 0.1
    w = rng.standard_normal((B, 1, J - 1, 3)).astype(np.float32) * 0.01
    t_obs = np.arange(N_PAST, dtype=np.float32)[None, :, None, None]
    obs = jnp.asarray(base + w * t_obs)
    target = jnp.asarray(
        rng.standard_normal((B, int(2.5 * PRED), J - 1, 3)), jnp.float32
    ) * 0.1
    return skeleton, obs, target, base, w


def _ramp_predictor(rng, obs, num_samples=S, pred_length=PRED):
    """Deterministic velocity-continuing predictor: sample s extrapolates
    the observation's own last-frame velocity scaled by (1 + 0.5·s); lets
    the chained result be written in closed form."""
    last = obs[:, -1]
    vel = obs[:, -1] - obs[:, -2]
    t = jnp.arange(1, pred_length + 1, dtype=obs.dtype)
    scale = 1.0 + 0.5 * jnp.arange(num_samples, dtype=obs.dtype)
    pred = (
        last[:, None, None]
        + vel[:, None, None] * t[None, None, :, None, None]
        * scale[None, :, None, None, None]
    )
    return pred, None


@pytest.mark.parametrize("fn", [
    long_term_prediction_best_every50, long_term_prediction_best_first50,
], ids=["best_every50", "best_first50"])
def test_fractional_factor_shapes_and_metric_space(rescale_env, fn):
    """factor=2.5 → ceil→3 rounds, last truncated to PRED/2; outputs are in
    METRIC space (RescalePose: input × pose_box_size)."""
    skeleton, obs, target, _, _ = rescale_env
    target_m, pred_m = fn(
        _ramp_predictor, skeleton, jax.random.key(0), obs, target,
        num_samples=S, pred_length=PRED, long_term_factor=2.5,
    )
    total = int(2.5 * PRED)
    assert target_m.shape == (B, total, J - 1, 3)
    assert pred_m.shape == (B, S, total, J - 1, 3)
    np.testing.assert_allclose(
        np.asarray(target_m),
        np.asarray(skeleton.transform_to_metric_space(target)), atol=1e-6,
    )


def test_feedback_chain_is_input_space(rescale_env):
    """Our documented divergence from `eval_utils.py:63`: the re-fed
    observation is the INPUT-space prediction, so with a deterministic
    velocity-v ramp predictor the chained best sample is one unbroken
    input-space ramp — under the reference's metric-space re-feed the
    ramp's base would jump by ×pose_box_size each round."""
    skeleton, obs, target, base, w = rescale_env
    target_m, pred_m = long_term_prediction_best_every50(
        _ramp_predictor, skeleton, jax.random.key(0), obs, target,
        num_samples=1, pred_length=PRED, long_term_factor=2.0,
    )
    # with one sample the selection is trivial: the full chain continues the
    # obs ramp (slope w) unbroken in input space, then × BOX to metric
    last = np.asarray(obs[:, -1:])
    t = np.arange(1, 2 * PRED + 1, dtype=np.float32)[None, :, None, None]
    expected_in = last + w * t
    np.testing.assert_allclose(
        np.asarray(pred_m[:, 0]), expected_in * BOX, atol=1e-5,
    )


def test_best_first50_propagates_every_sample(rescale_env):
    """Each sample continues ITS OWN trajectory (reference
    `eval_utils.py:77-99`): sample s is the unbroken ramp with slope
    w·(1 + 0.5·s) — not a copy of the best one (round ≥1 runs the predictor
    with num_samples=1 on each sample's own tail, whose velocity is already
    the scaled slope)."""
    skeleton, obs, target, base, w = rescale_env
    _, pred_m = long_term_prediction_best_first50(
        _ramp_predictor, skeleton, jax.random.key(0), obs, target,
        num_samples=S, pred_length=PRED, long_term_factor=2.0,
    )
    last = np.asarray(obs[:, -1:])
    t = np.arange(1, 2 * PRED + 1, dtype=np.float32)[None, :, None, None]
    for s in range(S):
        expected_in = last + w * (1.0 + 0.5 * s) * t
        np.testing.assert_allclose(
            np.asarray(pred_m[:, s]), expected_in * BOX, atol=1e-5,
            err_msg=f"sample {s} did not propagate its own chain",
        )
