"""Fused ResnetBlock Pallas kernel ≡ flax ResnetBlock (interpret mode)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from skeletondiffusion_tpu.ops.attention import ResnetBlock
from skeletondiffusion_tpu.ops.pallas.resnet_block import (
    prep_resnet_params,
    resnet_block_pallas,
)

N, B, F, TDIM = 21, 16, 192, 768
NODE_TYPES = np.array([i % 3 for i in range(N)], dtype=np.int32)


def _build():
    blk = ResnetBlock(
        F, F, num_nodes=N, time_emb_dim=TDIM, node_types=NODE_TYPES,
        learn_influence=True, node_major=True,
    )
    x = jax.random.normal(jax.random.key(0), (N, B, F)) * 0.5
    t = jax.random.normal(jax.random.key(1), (1, TDIM)) * 0.3
    params = blk.init(jax.random.key(2), x, t)
    # make G non-trivial (init is identity)
    params = jax.tree.map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.key(3), p.shape), params
    )
    return blk, params, x, t


def test_fused_resnet_block_matches_flax():
    blk, params, x, t = _build()
    ref = blk.apply(params, x, t)

    p = params["params"]
    ops = prep_resnet_params(p, NODE_TYPES, N)
    # FiLM projection outside the kernel: mlp(tanh(t)) → scale‖shift
    tt = jnp.tanh(t) @ p["mlp"]["kernel"] + p["mlp"]["bias"]
    out = resnet_block_pallas(
        x, tt, **ops, batch_tile=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_resnet_block_no_film():
    blk, params, x, t = _build()
    # zero film ≡ scale=0, shift=0 → plain double-block
    ref = blk.apply(params, x, jnp.zeros_like(t) * jnp.nan)  # not used below

    p = params["params"]
    ops = prep_resnet_params(p, NODE_TYPES, N)
    out = resnet_block_pallas(
        x, jnp.zeros((1, 2 * F)), **ops, batch_tile=8, interpret=True
    )
    # reference path with scale/shift == 0: run flax with a time embedding
    # that produces exactly zero film — emulate by zeroing the mlp params
    p0 = jax.tree.map(lambda a: a, params)
    p0["params"]["mlp"]["kernel"] = jnp.zeros_like(p["mlp"]["kernel"])
    p0["params"]["mlp"]["bias"] = jnp.zeros_like(p["mlp"]["bias"])
    ref0 = blk.apply(p0, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref0), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("layer_fused", ["0", "1"])
def test_fused_denoiser_matches_flax(layer_fused, monkeypatch):
    # "1" exercises the per-layer mono-kernels (ops/pallas/layer_fused.py)
    monkeypatch.setenv("SKELDIFF_LAYER_FUSED", layer_fused)
    from skeletondiffusion_tpu.models.denoiser import Denoiser
    from skeletondiffusion_tpu.ops.pallas.denoiser_fused import fused_denoiser_apply

    L = 96
    den = Denoiser(
        dim=L, out_dim=L, channels=N, cond_dim=L, depth=2,
        node_types=NODE_TYPES, learn_influence=True,
        attn_dim_head=32, attn_heads=8, node_major=True,
    )
    x = jax.random.normal(jax.random.key(10), (B, N, L)) * 0.5
    xc = jax.random.normal(jax.random.key(11), (B, N, L)) * 0.5
    t = jnp.asarray(3, jnp.int32)
    variables = den.init(jax.random.key(12), x, t, xc)
    variables = jax.tree.map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.key(13), p.shape), variables
    )

    ref = den.apply(variables, x, t, xc)
    u = den.apply(variables, xc, method=Denoiser.cond_embedding)
    out = fused_denoiser_apply(den, variables, x, t, u, batch_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_fused_denoiser_ragged_batch():
    """B not a multiple of batch_tile exercises the pad/slice path."""
    from skeletondiffusion_tpu.models.denoiser import Denoiser
    from skeletondiffusion_tpu.ops.pallas.denoiser_fused import fused_denoiser_apply

    L = 96
    den = Denoiser(
        dim=L, out_dim=L, channels=N, cond_dim=L, depth=1,
        node_types=NODE_TYPES, learn_influence=True,
        attn_dim_head=32, attn_heads=8, node_major=True,
    )
    Brag = 11
    x = jax.random.normal(jax.random.key(20), (Brag, N, L)) * 0.5
    xc = jax.random.normal(jax.random.key(21), (Brag, N, L)) * 0.5
    t = jnp.asarray(1, jnp.int32)
    variables = den.init(jax.random.key(22), x, t, xc)

    ref = den.apply(variables, x, t, xc)
    u = den.apply(variables, xc, method=Denoiser.cond_embedding)
    out = fused_denoiser_apply(den, variables, x, t, u, batch_tile=8, interpret=True)
    assert out.shape == (Brag, N, L)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_fused_denoiser_no_learn_influence():
    """learn_influence=False denoisers have no G params — the fused prep must
    substitute identity influence instead of KeyError'ing (review finding)."""
    from skeletondiffusion_tpu.models.denoiser import Denoiser
    from skeletondiffusion_tpu.ops.pallas.denoiser_fused import fused_denoiser_apply

    L = 96
    den = Denoiser(
        dim=L, out_dim=L, channels=N, cond_dim=L, depth=1,
        node_types=NODE_TYPES, learn_influence=False,
        attn_dim_head=32, attn_heads=8, node_major=True,
    )
    x = jax.random.normal(jax.random.key(30), (8, N, L)) * 0.5
    xc = jax.random.normal(jax.random.key(31), (8, N, L)) * 0.5
    t = jnp.asarray(2, jnp.int32)
    variables = den.init(jax.random.key(32), x, t, xc)

    ref = den.apply(variables, x, t, xc)
    u = den.apply(variables, xc, method=Denoiser.cond_embedding)
    out = fused_denoiser_apply(den, variables, x, t, u, batch_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)
