"""Pallas kernel correctness vs the flax/XLA reference path (interpret mode
on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeletondiffusion_tpu.models import AutoEncoder
from skeletondiffusion_tpu.ops.pallas.gru_rollout import decode_rollout


@pytest.mark.parametrize("with_types", [True, False])
def test_fused_rollout_matches_flax_decoder(with_types):
    N, H, L, PH, B = 5, 8, 8, 7, 4
    node_types = np.array([0, 1, 1, 2, 0]) if with_types else None
    ae = AutoEncoder(
        num_nodes=N, encoder_hidden_size=H, decoder_hidden_size=H, latent_size=L,
        node_types=node_types,
    )
    x = jax.random.normal(jax.random.key(1), (B, 3, N, 3)) * 0.3
    z = jax.random.normal(jax.random.key(2), (B, N, L)) * 0.5
    params = ae.init(
        jax.random.key(0), jnp.zeros((B, PH, N, 3)), x, ph=PH, method=AutoEncoder.autoencode
    )

    ref = ae.apply(params, x, z, None, ph=PH, method=AutoEncoder.decode)
    fused = decode_rollout(
        params["params"]["decoder"], node_types, x[:, -2:], z, ph=PH,
        batch_tile=B, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)

    # merged-gate bf16 kernel: same math with bf16 operand rounding; the
    # tolerance covers the per-step r/z rounding over the short rollout
    merged = decode_rollout(
        params["params"]["decoder"], node_types, x[:, -2:], z, ph=PH,
        batch_tile=B, compute_dtype="bfloat16", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(merged), np.asarray(ref), atol=3e-2)
    np.testing.assert_array_less(
        np.abs(np.asarray(merged) - np.asarray(ref)).mean(), 3e-3
    )
