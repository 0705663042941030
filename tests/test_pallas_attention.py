"""Fused joint-attention core kernel ≡ reference einsums (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from skeletondiffusion_tpu.ops.pallas.joint_attention import attention_core_pallas

N, B, H, C = 21, 16, 8, 32


def _reference_core(qkv):
    hd = H * C
    q, k, v = qkv[:, :, :hd], qkv[:, :, hd : 2 * hd], qkv[:, :, 2 * hd :]
    shape4 = (N, B, H, C)
    q = q.reshape(shape4) * (C**-0.5)
    k = k.reshape(shape4)
    v = v.reshape(shape4)
    sim = jnp.einsum("nbhc,mbhc->bhnm", q, k)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhnm,mbhc->nbhc", attn, v).reshape(N, B, hd)


def test_attention_core_matches_einsums():
    qkv = jax.random.normal(jax.random.key(0), (N, B, 3 * H * C)) * 0.7
    ref = _reference_core(qkv)
    out = attention_core_pallas(qkv, heads=H, dim_head=C, batch_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_attention_core_batch_tiling_invariance():
    qkv = jax.random.normal(jax.random.key(1), (N, B, 3 * H * C)) * 0.7
    a = attention_core_pallas(qkv, heads=H, dim_head=C, batch_tile=8, interpret=True)
    b = attention_core_pallas(qkv, heads=H, dim_head=C, batch_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_attention_projection_kernels_match_reference():
    """rms_qkv + outproj_res ≡ RMSNorm + graph-linear math (interpret)."""
    from skeletondiffusion_tpu.ops.graph_linear import gmm_nm, gmix_nm
    from skeletondiffusion_tpu.ops.pallas.attention_proj import (
        outproj_res_pallas,
        rms_qkv_pallas,
    )

    Fp, hd = 256, H * C
    x = jax.random.normal(jax.random.key(2), (N, B, Fp)) * 0.5
    g_rms = jax.random.normal(jax.random.key(3), (1, Fp)) * 0.2 + 1.0
    w_qkv = jax.random.normal(jax.random.key(4), (N, Fp, 3 * hd)) * 0.05
    g_qkv = jax.nn.softmax(jax.random.normal(jax.random.key(5), (N, N)), axis=1)
    w_out = jax.random.normal(jax.random.key(6), (N, hd, Fp)) * 0.05
    g_out = jax.nn.softmax(jax.random.normal(jax.random.key(7), (N, N)), axis=1)

    norm = jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12, None)
    h = (x / norm) * g_rms[0][None, None, :]
    ref_qkv = gmix_nm(g_qkv, gmm_nm(h, w_qkv))
    got_qkv = rms_qkv_pallas(x, g_rms, w_qkv, g_qkv, batch_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got_qkv), np.asarray(ref_qkv), atol=3e-5, rtol=1e-4)

    a = jax.random.normal(jax.random.key(8), (N, B, hd)) * 0.5
    ref_out = gmix_nm(g_out, gmm_nm(a, w_out)) + x
    got_out = outproj_res_pallas(a, x, w_out, g_out, batch_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=3e-5, rtol=1e-4)
