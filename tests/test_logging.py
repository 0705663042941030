"""MetricsLogger unit tests: the norm paths compute ON DEVICE and must
match a host-side reference bit-closely (reference logs per-weight scalars
every 100 iterations and per-epoch histograms,
`src/utils/tensorboard.py:58-122`)."""
import json

import jax.numpy as jnp
import numpy as np

from skeletondiffusion_tpu.utils.logging import MetricsLogger


def _params():
    return {
        "enc": {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) / 7.0,
                "b": jnp.array([0.5, -1.5, 2.0])},
        "dec": {"w": jnp.full((5,), 0.25)},
    }


def _host_global_norm(tree):
    leaves = [np.asarray(l, np.float64) for l in
              (tree["enc"]["w"], tree["enc"]["b"], tree["dec"]["w"])]
    return float(np.sqrt(sum((a * a).sum() for a in leaves)))


def _rows(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_param_norms_on_device_match_host(tmp_path):
    lg = MetricsLogger(str(tmp_path), norms_every=2)
    p = _params()
    lg.log_param_norms(0, p, grads=p)
    lg.log_param_norms(1, p)  # skipped: 1 % norms_every != 0
    lg.close()
    rows = [r for r in _rows(tmp_path / "metrics.jsonl") if r["prefix"] == "norms"]
    assert len(rows) == 1
    expect = _host_global_norm(p)
    assert abs(rows[0]["param_global_norm"] - expect) < 1e-5 * expect
    assert abs(rows[0]["grad_global_norm"] - expect) < 1e-5 * expect


def test_param_norms_prefers_precomputed_grad_norm(tmp_path):
    lg = MetricsLogger(str(tmp_path), norms_every=1)
    lg.log_param_norms(0, _params(), grads=_params(), grad_norm=jnp.float32(3.25))
    lg.close()
    (row,) = [r for r in _rows(tmp_path / "metrics.jsonl") if r["prefix"] == "norms"]
    assert row["grad_global_norm"] == 3.25


def test_param_histograms_per_leaf_norms(tmp_path):
    lg = MetricsLogger(str(tmp_path), norms_every=1)
    p = _params()
    lg.log_param_histograms(3, p, grads=p)
    lg.close()
    (row,) = [r for r in _rows(tmp_path / "metrics.jsonl") if r["prefix"] == "hist"]
    for tag in ("weights_norm", "grads_norm"):
        for name, leaf in (("enc/w", p["enc"]["w"]), ("enc/b", p["enc"]["b"]),
                           ("dec/w", p["dec"]["w"])):
            expect = float(np.sqrt((np.asarray(leaf, np.float64) ** 2).sum()))
            assert abs(row[f"{tag}/{name}"] - expect) < 1e-5 * max(expect, 1e-9), (tag, name)
    assert row["step"] == 3
