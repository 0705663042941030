"""FID classifier parity (flax GRU vs the reference's torch nn.GRU) and the
Fréchet distance math."""
import os

import numpy as np
import pytest

from skeletondiffusion_tpu.metrics.fid import (
    ClassifierForFID,
    fid_from_activations,
    port_classifier,
)

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "fid_classifier.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(GOLD), reason="goldens not generated")


def test_classifier_matches_torch():
    import jax.numpy as jnp

    g = np.load(GOLD)
    sd = {k: g[k] for k in g.files if k not in ("motion", "feats", "logits")}
    clf = ClassifierForFID()
    params = {"params": port_classifier(sd)}
    motion = jnp.asarray(g["motion"])
    h0 = jnp.zeros((2, motion.shape[0], 128))
    feats = clf.apply(params, motion, h0, method=ClassifierForFID.get_fid_features)
    np.testing.assert_allclose(np.asarray(feats), g["feats"], atol=1e-4)
    logits = clf.apply(params, motion, h0)
    np.testing.assert_allclose(np.asarray(logits), g["logits"], atol=1e-4)


def test_frechet_distance_properties(rng):
    a = rng.standard_normal((500, 16))
    b = rng.standard_normal((500, 16)) + 2.0
    assert fid_from_activations(a, a) == pytest.approx(0.0, abs=1e-6)
    d = fid_from_activations(a, b)
    assert d > 16 * 3.5  # mean shift of 2 per dim → ≥ 4·16 minus sampling noise
