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
