"""The hoisted-conditioning sampling fast path must match the plain path."""
import jax
import jax.numpy as jnp
import numpy as np

from skeletondiffusion_tpu.diffusion.manager import create_diffusion
from skeletondiffusion_tpu.skeleton import create_skeleton


def test_sampling_with_cond_hoist_matches_plain():
    sk = create_skeleton(
        dataset_name="h36m", motion_repr_type="SkeletonRescalePose", num_joints=17,
        pose_box_size=1.5, obs_length=5, pred_length=8, if_consider_hip=False,
    )
    L = 12
    diffusion, den = create_diffusion(
        sk, diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency", latent_size=L,
        diffusion_conditioning=True, diffusion_timesteps=4,
        diffusion_arch={"depth": 1, "attn_heads": 2, "attn_dim_head": 4,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
    )
    assert diffusion.cond_embed is not None
    N = sk.num_nodes
    params = den.init(
        jax.random.key(0), jnp.zeros((2, N, L)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, N, L)),
    )
    x_cond = jax.random.normal(jax.random.key(1), (6, N, L)) * 0.5

    fast, _ = diffusion.sample(params, jax.random.key(2), batch_size=6, x_cond=x_cond)

    diffusion.cond_embed = None  # disable the hoist → plain per-step path
    plain, _ = diffusion.sample(params, jax.random.key(2), batch_size=6, x_cond=x_cond)

    np.testing.assert_allclose(np.asarray(fast), np.asarray(plain), atol=2e-5)
