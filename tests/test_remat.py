"""remat_denoiser: loss AND gradients bit-identical to the plain path
(jax.checkpoint is exact — it only changes what the backward stores)."""
import jax
import jax.numpy as jnp
import numpy as np

from skeletondiffusion_tpu.diffusion.manager import create_diffusion
from skeletondiffusion_tpu.skeleton import create_skeleton


def _build(remat: bool):
    sk = create_skeleton(
        dataset_name="h36m", motion_repr_type="SkeletonRescalePose", num_joints=17,
        pose_box_size=1.5, obs_length=5, pred_length=8, if_consider_hip=False,
    )
    L = 12
    diffusion, den = create_diffusion(
        sk, diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency", latent_size=L,
        diffusion_conditioning=True, diffusion_timesteps=4,
        remat_denoiser=remat,
        diffusion_arch={"depth": 1, "attn_heads": 2, "attn_dim_head": 4,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
    )
    return sk, diffusion, den, L


def test_remat_denoiser_identical_loss_and_grads():
    sk, diff_plain, den, L = _build(remat=False)
    _, diff_remat, _, _ = _build(remat=True)
    N = sk.num_nodes
    params = den.init(
        jax.random.key(0), jnp.zeros((2, N, L)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, N, L)),
    )
    x = jax.random.normal(jax.random.key(1), (6, N, L)) * 0.5
    x_cond = jax.random.normal(jax.random.key(2), (6, N, L)) * 0.5

    def scalar_loss(engine):
        def f(p):
            loss, w, _ = engine.loss(p, jax.random.key(3), x, x_cond=x_cond)
            return jnp.mean(loss * w)
        return f

    l0, g0 = jax.value_and_grad(scalar_loss(diff_plain))(params)
    l1, g1 = jax.value_and_grad(scalar_loss(diff_remat))(params)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # sampling path (model_apply_ucond is wrapped too) is unchanged
    s0, _ = diff_plain.sample(params, jax.random.key(4), batch_size=4, x_cond=x_cond[:4])
    s1, _ = diff_remat.sample(params, jax.random.key(4), batch_size=4, x_cond=x_cond[:4])
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-6)
