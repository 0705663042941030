"""The fully-fused node-major sampling path (Pallas denoiser core + one-kernel
posterior update, `engine.p_sample_loop` nm branch) must produce bit-near
samples vs the plain XLA path — same fold_in noise schedule by construction."""
import jax
import jax.numpy as jnp
import numpy as np

from skeletondiffusion_tpu.diffusion.manager import create_diffusion
from skeletondiffusion_tpu.skeleton import create_skeleton


def test_fused_nm_sampling_matches_plain():
    from skeletondiffusion_tpu.ops.pallas.denoiser_fused import (
        fused_denoiser_core_nm,
        prep_fused_denoiser,
    )
    from skeletondiffusion_tpu.ops.pallas.posterior_step import posterior_step_pallas

    sk = create_skeleton(
        dataset_name="h36m", motion_repr_type="SkeletonRescalePose", num_joints=17,
        pose_box_size=1.5, obs_length=5, pred_length=8, if_consider_hip=False,
    )
    L = 96  # flagship latent size → lat_pad 128, f_pad 256, attn hd 256
    diffusion, den = create_diffusion(
        sk, diffusion_type="NonisotropicGaussianDiffusion",
        covariance_matrix_type="adjacency", latent_size=L,
        diffusion_conditioning=True, diffusion_timesteps=4,
        diffusion_arch={"depth": 1, "attn_heads": 8, "attn_dim_head": 32,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
    )
    N = sk.num_nodes
    B = 4
    params = den.init(
        jax.random.key(0), jnp.zeros((2, N, L)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, N, L)),
    )
    x_cond = jax.random.normal(jax.random.key(1), (B, N, L)) * 0.5

    plain, _ = diffusion.sample(params, jax.random.key(2), batch_size=B, x_cond=x_cond)

    # wire the nm hooks the way the eval predictor does, in interpret mode
    prepped = prep_fused_denoiser(den, params)
    tables = diffusion.process.posterior_step_tables()
    base_embed = diffusion.cond_embed

    def cond_embed_nm(p, xc):
        u = base_embed(p, xc)
        return {"u_pad": jnp.pad(u, ((0, 0), (0, 0), (0, 256 - u.shape[-1])))}

    def sample_step_nm(p, img_nm, t, uc, noise_nm):
        mo = fused_denoiser_core_nm(
            den, p, img_nm, t, uc["u_pad"], prepped=prepped,
            batch_tile=8, interpret=True,
        )
        return posterior_step_pallas(
            mo, img_nm, noise_nm, tables[t], batch_tile=8, interpret=True
        )

    diffusion.cond_embed = cond_embed_nm
    diffusion.sample_step_nm = sample_step_nm
    fused, _ = diffusion.sample(params, jax.random.key(2), batch_size=B, x_cond=x_cond)

    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), atol=2e-4, rtol=1e-3)
