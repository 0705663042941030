"""Probabilistic sample-set metrics over predictions [B, S, T, J, 3].

Jittable re-implementations of reference `src/metrics/multimodal.py` —
designed to run ON DEVICE for whole batches (the reference optionally moves
tensors to CPU per batch, `eval.py:82-85`; here the entire metric suite stays
in the same XLA program as the sampler).  The ragged multimodal ground truth
(Python list collate upstream, `motion_dataset.py:21-29`) is represented as a
padded tensor [B, M, T, J, 3] + validity mask [B, M] so MMADE/MMFDE become
masked minima.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
_BIG = 1e9


def _time_slice(x: Array, t0: int, t: int, axis: int) -> Array:
    """Reference `multimodal.py:4-8`."""
    if t0 == 0 and t == -1:
        return x
    end = x.shape[axis] if t == -1 else t
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(t0, end)
    return x[tuple(idx)]


def apd(pred: Array, t0: int = 0, t: int = -1, **kw) -> Array:
    """Average pairwise distance over samples (upper triangle mean);
    reference `multimodal.py:15-35`."""
    pred = _time_slice(pred, t0, t, 2)
    B, S = pred.shape[:2]
    if S == 1:
        return jnp.zeros((B,), pred.dtype)
    arr = pred.reshape(B, S, -1)
    # pairwise Euclidean distances [B,S,S] via the Gram expansion (a [S,D]
    # matmul → MXU) — centered per item first, otherwise the x²+y²−2xy
    # cancellation on ~O(1)-offset poses costs ~1e-3 absolute error
    arr = arr - arr.mean(axis=1, keepdims=True)
    sq = jnp.sum(arr**2, axis=-1)
    d2 = sq[:, :, None] + sq[:, None, :] - 2 * jnp.einsum(
        "bsd,btd->bst", arr, arr, precision=jax.lax.Precision.HIGHEST
    )
    dist = jnp.sqrt(jnp.clip(d2, 0, None))
    iu = np.triu_indices(S, k=1)
    return dist[:, iu[0], iu[1]].mean(axis=-1)


def mpjpe(target: Array, pred: Array, **kw) -> Array:
    """Min-over-samples of time-mean joint-mean position error; reference
    `multimodal.py:37-42`."""
    dist = jnp.linalg.norm(target[:, None] - pred, axis=-1).mean(axis=-1)  # [B,S,T]
    return dist.mean(axis=-1).min(axis=-1)


def ade(target: Array, pred: Array, t0: int = 0, t: int = -1, reduction: str = "mean", **kw) -> Array:
    """Min-over-samples average displacement (whole-pose norm per frame);
    reference `multimodal.py:44-57`."""
    pred, target = _time_slice(pred, t0, t, 2), _time_slice(target, t0, t, 1)
    B, S, T = pred.shape[:3]
    # trailing -1 folds joints×xyz; a mismatched time length whose sizes
    # happen to divide would silently interleave frames into features
    assert target.shape[1] == T, (target.shape, pred.shape)
    diff = pred.reshape(B, S, T, -1) - target.reshape(B, 1, T, -1)
    dist = jnp.linalg.norm(diff, axis=-1).mean(axis=-1)
    return dist.min(axis=-1) if reduction == "mean" else dist


def fde(target: Array, pred: Array, t0: int = 0, t: int = -1, reduction: str = "mean", **kw) -> Array:
    """Min-over-samples final displacement; reference `multimodal.py:60-73`."""
    pred, target = _time_slice(pred, t0, t, 2), _time_slice(target, t0, t, 1)
    B, S, T = pred.shape[:3]
    assert target.shape[1] == T, (target.shape, pred.shape)
    diff = pred.reshape(B, S, T, -1) - target.reshape(B, 1, T, -1)
    dist = jnp.linalg.norm(diff, axis=-1)[..., -1]
    return dist.min(axis=-1) if reduction == "mean" else dist


def mae(
    target: Array,
    pred: Array,
    limbseq,
    limb_angles_idx: Sequence[Sequence[int]],
    t0: int = 0,
    t: int = -1,
    **kw,
) -> Array:
    """Min-over-samples mean limb-angle error in degrees; reference
    `multimodal.py:76-102`."""
    pred, target = _time_slice(pred, t0, t, 2), _time_slice(target, t0, t, 1)
    limbseq = np.sort(np.asarray(limbseq), axis=-1)
    pairs = np.asarray(
        [[kin[i], kin[i + 1]] for kin in limb_angles_idx for i in range(len(kin) - 1)]
    )

    def cos_sim(vecs):
        a = vecs[..., pairs[:, 0], :]
        b = vecs[..., pairs[:, 1], :]
        num = jnp.einsum("...jd,...jd->...j", a, b)
        den = jnp.sqrt((a**2).sum(-1)) * jnp.sqrt((b**2).sum(-1))
        return num / jnp.clip(den, 1e-7, None)

    vec_t = target[..., limbseq[:, 1], :] - target[..., limbseq[:, 0], :]
    vec_p = pred[..., limbseq[:, 1], :] - pred[..., limbseq[:, 0], :]
    cs_t = cos_sim(vec_t[:, None])
    cs_p = cos_sim(vec_p)
    diff = jnp.arccos(jnp.clip(cs_p, -1, 1)) - jnp.arccos(jnp.clip(cs_t, -1, 1))
    dist = jnp.abs(diff).mean(-1).mean(axis=-1)
    return (dist * (180.0 / np.pi)).min(axis=-1)


def mmade(
    target: Array, pred: Array, mm_gt: Array, mm_mask: Array, t0: int = 0, t: int = -1, **kw
) -> Array:
    """Multimodal ADE: for each valid mm-GT neighbor take the min-over-samples
    ADE, then average over neighbors; reference `multimodal.py:105-119`
    (per-item Python loop upstream → fully batched masked form here)."""
    pred = _time_slice(pred, t0, t, 2)
    mm_gt = _time_slice(mm_gt, t0, t, 2)
    B, S, T = pred.shape[:3]
    M = mm_gt.shape[1]
    assert mm_gt.shape[2] == T, (mm_gt.shape, pred.shape)
    p = pred.reshape(B, 1, S, T, -1)
    g = mm_gt.reshape(B, M, 1, T, -1)
    dist = jnp.linalg.norm(p - g, axis=-1).mean(axis=-1)   # [B,M,S]
    per_gt = dist.min(axis=-1)                              # [B,M]
    w = mm_mask.astype(per_gt.dtype)
    return (per_gt * w).sum(-1) / jnp.clip(w.sum(-1), 1, None)


def mmfde(
    target: Array, pred: Array, mm_gt: Array, mm_mask: Array, t0: int = 0, t: int = -1, **kw
) -> Array:
    """Multimodal FDE; reference `multimodal.py:121-135`."""
    pred = _time_slice(pred, t0, t, 2)
    mm_gt = _time_slice(mm_gt, t0, t, 2)
    B, S, T = pred.shape[:3]
    M = mm_gt.shape[1]
    assert mm_gt.shape[2] == T, (mm_gt.shape, pred.shape)
    p = pred.reshape(B, 1, S, T, -1)
    g = mm_gt.reshape(B, M, 1, T, -1)
    dist = jnp.linalg.norm(p - g, axis=-1)[..., -1]
    per_gt = dist.min(axis=-1)
    w = mm_mask.astype(per_gt.dtype)
    return (per_gt * w).sum(-1) / jnp.clip(w.sum(-1), 1, None)


def lat_apd(lat_pred: Array, **kw) -> Array:
    """APD in latent space with L1 distances; reference
    `multimodal.py:137-151`."""
    B, S = lat_pred.shape[:2]
    flat = lat_pred.reshape(B, S, -1)
    d = jnp.sum(jnp.abs(flat[:, :, None] - flat[:, None, :]), axis=-1)
    iu = np.triu_indices(S, k=1)
    return d[:, iu[0], iu[1]].mean(axis=-1)


def motion_for_cmd(pred: Array) -> Array:
    """Per-frame mean joint displacement averaged over samples: input
    [B,S,T,J,3] → [B,T-1]; reference `src/metrics/cmd.py:10-12`."""
    vel = jnp.linalg.norm(pred[..., 1:, :, :] - pred[..., :-1, :, :], axis=-1)
    return vel.mean(axis=1).mean(axis=-1)


def cmd_from_curve(val_per_frame: np.ndarray, val_ref: float) -> float:
    """Σ_t (T−t)·|M_t − M̄|; reference `multimodal.py:10-13`."""
    T = len(val_per_frame) + 1
    return float(np.sum([(T - t) * np.abs(val_per_frame[t - 1] - val_ref) for t in range(1, T)]))


def resolve_cmd(
    motion_curves: np.ndarray,
    obs_classes: np.ndarray,
    mean_motion_per_class: Sequence[float],
) -> float:
    """Class-weighted CMD over the accumulated per-segment motion curves;
    reference `src/metrics/cmd.py:15-31`."""
    results = 0.0
    n_classes = len(mean_motion_per_class)
    for i in range(n_classes):
        mask = obs_classes == i
        if mask.sum() == 0:
            continue
        mean_curve = motion_curves[mask].mean(axis=0)
        results += cmd_from_curve(mean_curve, mean_motion_per_class[i]) * (
            mask.sum() / obs_classes.shape[0]
        )
    return results


def best_sample_index(pred: Array, target: Array) -> Array:
    """Per-item index of the sample closest to GT under the reference's
    selection norm — per-JOINT L2, mean over joints, mean over time
    (`src/metrics/utils.py:12-30`).  NOTE this is NOT the ADE norm (which
    folds joints×xyz into one vector before the L2, `multimodal.py:44-57`);
    the two argmins can disagree, and the long-term recursion's feedback
    chain depends on which one is used."""
    dist = jnp.linalg.norm(pred - target[:, None], axis=-1)  # [B,S,T,N]
    return jnp.argmin(dist.mean(axis=(-1, -2)), axis=-1)


def choose_best_sample(pred: Array, target: Array) -> Array:
    """Closest-to-GT sample per item; reference `src/metrics/utils.py:12-30`
    (per-joint-norm selection, see :func:`best_sample_index`)."""
    idx = best_sample_index(pred, target)
    return jnp.take_along_axis(pred, idx[:, None, None, None, None], axis=1)[:, 0]
