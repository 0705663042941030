"""FID over a pretrained H36M action-classifier's GRU features.

Reference `src/metrics/{fid,fid_classifier}.py`: a 2-layer GRU classifier on
48-dim (16 joints × 3) pose features; FID = Fréchet distance between
activation statistics of predictions and ground truth.  The classifier here
is a flax module with a ``port_classifier`` converter for the reference's
``h36m_classifier.pth`` torch weights.
"""
from __future__ import annotations

import warnings
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class ClassifierForFID(nn.Module):
    """2-layer GRU (torch nn.GRU semantics) + 2 linear heads; reference
    `fid_classifier.py:5-57`."""

    input_size: int = 48
    hidden_size: int = 128
    hidden_layer: int = 2
    output_size: int = 15

    def setup(self):
        init = nn.initializers.lecun_normal()
        H = self.hidden_size
        for layer in range(self.hidden_layer):
            in_size = self.input_size if layer == 0 else H
            setattr(self, f"w_ih_l{layer}_", self.param(f"w_ih_l{layer}", init, (in_size, 3 * H)))
            setattr(self, f"w_hh_l{layer}_", self.param(f"w_hh_l{layer}", init, (H, 3 * H)))
            setattr(self, f"b_ih_l{layer}_", self.param(f"b_ih_l{layer}", nn.initializers.zeros, (3 * H,)))
            setattr(self, f"b_hh_l{layer}_", self.param(f"b_hh_l{layer}", nn.initializers.zeros, (3 * H,)))
        self.linear1 = nn.Dense(30, name="linear1")
        self.linear2 = nn.Dense(self.output_size, name="linear2")

    def _gru_features(self, motion: Array, h0: Array) -> Array:
        """motion [B, F, T] (reference layout) → last GRU output [B, H]."""
        x = jnp.transpose(motion, (0, 2, 1))  # [B, T, F]

        for layer in range(self.hidden_layer):
            w_ih = getattr(self, f"w_ih_l{layer}_")
            w_hh = getattr(self, f"w_hh_l{layer}_")
            b_ih = getattr(self, f"b_ih_l{layer}_")
            b_hh = getattr(self, f"b_hh_l{layer}_")

            def step(h, xt, w_ih=w_ih, w_hh=w_hh, b_ih=b_ih, b_hh=b_hh):
                gi = xt @ w_ih + b_ih
                gh = h @ w_hh + b_hh
                i_r, i_z, i_n = jnp.split(gi, 3, -1)
                h_r, h_z, h_n = jnp.split(gh, 3, -1)
                r = jax.nn.sigmoid(i_r + h_r)
                z = jax.nn.sigmoid(i_z + h_z)
                n = jnp.tanh(i_n + r * h_n)
                hy = (1 - z) * n + z * h
                return hy, hy

            h_final, ys = jax.lax.scan(step, h0[layer], jnp.swapaxes(x, 0, 1))
            x = jnp.swapaxes(ys, 0, 1)
        return x[:, -1]

    def get_fid_features(self, motion: Array, h0: Array) -> Array:
        """[B, 48, T] → tanh(linear1(gru_last)) [B, 30]; reference
        `fid_classifier.py:41-52`."""
        return jnp.tanh(self.linear1(self._gru_features(motion, h0)))

    def __call__(self, motion: Array, h0: Array) -> Array:
        return self.linear2(self.get_fid_features(motion, h0))


def port_classifier(sd: Dict[str, np.ndarray], hidden_layer: int = 2) -> Dict:
    """Reference torch ``h36m_classifier.pth`` state_dict → flax params."""
    p: Dict[str, np.ndarray] = {}
    for l in range(hidden_layer):
        p[f"w_ih_l{l}"] = sd[f"recurrent.weight_ih_l{l}"].T
        p[f"w_hh_l{l}"] = sd[f"recurrent.weight_hh_l{l}"].T
        p[f"b_ih_l{l}"] = sd[f"recurrent.bias_ih_l{l}"]
        p[f"b_hh_l{l}"] = sd[f"recurrent.bias_hh_l{l}"]
    p["linear1"] = {"kernel": sd["linear1.weight"].T, "bias": sd["linear1.bias"]}
    p["linear2"] = {"kernel": sd["linear2.weight"].T, "bias": sd["linear2.bias"]}
    return p


def fid_from_activations(act1: np.ndarray, act2: np.ndarray, eps: float = 1e-6) -> float:
    """Fréchet distance between activation statistics; reference
    `fid.py:16-73` (Dougal Sutherland's stable formulation)."""
    from scipy import linalg

    mu1, mu2 = act1.mean(0), act2.mean(0)
    s1 = np.cov(act1, rowvar=False)
    s2 = np.cov(act2, rowvar=False)
    diff = mu1 - mu2
    def _sqrtm_quiet(a):
        # SciPy < 1.18: `disp=True` default prints an error estimate on
        # near-singular products, so pass disp=False (returns a (root,
        # errest) tuple); SciPy >= 1.18 removed the kwarg and is silent
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", DeprecationWarning)
                root, _ = linalg.sqrtm(a, disp=False)
            return root
        except TypeError:
            return linalg.sqrtm(a)

    covmean = _sqrtm_quiet(s1.dot(s2))
    if not np.isfinite(covmean).all():
        offset = np.eye(s1.shape[0]) * eps
        covmean = _sqrtm_quiet((s1 + offset).dot(s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))
