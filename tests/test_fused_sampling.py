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


def test_posterior_step_tables_match_process_math():
    """[P1|P2|Uσ] tables + the fused kernel ≡ clip → q_posterior →
    combine_mean_var_noise (with the t>0 noise mask) for every t."""
    from skeletondiffusion_tpu.diffusion.process import build_nonisotropic_process
    from skeletondiffusion_tpu.ops.pallas.posterior_step import posterior_step_pallas

    N, D, B = 7, 12, 5
    rng = np.random.default_rng(0)
    a = rng.standard_normal((N, N))
    sigma = a @ a.T / N + 0.5 * np.eye(N)
    lam, u = np.linalg.eigh(sigma)
    proc = build_nonisotropic_process(
        sigma, lam, u, timesteps=4, objective="pred_x0"
    )
    tables = proc.posterior_step_tables()

    x0 = jnp.asarray(rng.standard_normal((B, N, D)) * 1.2, jnp.float32)
    xt = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    dp = 128
    nm = lambda a: jnp.pad(jnp.swapaxes(a, 0, 1), ((0, 0), (0, 0), (0, dp - D)))

    for t in range(4):
        mean, _, log_var = proc.q_posterior(jnp.clip(x0, -1.0, 1.0), xt, t)
        want = proc.combine_mean_var_noise(
            mean, log_var, eps if t > 0 else jnp.zeros_like(eps)
        )
        got = posterior_step_pallas(
            nm(x0), nm(xt), nm(eps), tables[t], batch_tile=8, interpret=True
        )
        got = jnp.swapaxes(got[:, :, :D], 0, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
