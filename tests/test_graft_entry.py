"""Driver-contract guards: entry() compiles single-device; dryrun_multichip
runs the sharded train step on the virtual CPU mesh; the AMASS-MANO
(51-node, 43 weight banks) flagship path traces."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[1].shape
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_dryrun_multichip_self_provisions_like_the_driver():
    """The driver imports __graft_entry__ and calls dryrun_multichip(8) in a
    process with NO env preparation (possibly a single real device).  Simulate
    that exactly: fresh interpreter, 1 visible CPU device, no XLA_FLAGS — the
    function must re-exec itself onto a virtual 8-device mesh and succeed."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"  # no TPU in CI; 1 CPU device < 8 triggers respawn
    code = (
        f"import sys; sys.path.insert(0, {repo!r}); "
        "import jax; assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as ge; ge.dryrun_multichip(8)"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout, proc.stdout


def test_amass_mano_denoiser_traces():
    from skeletondiffusion_tpu.diffusion.manager import create_diffusion
    from skeletondiffusion_tpu.skeleton import create_skeleton

    sk = create_skeleton(
        dataset_name="amass-mano", motion_repr_type="SkeletonRescalePose", num_joints=52,
        pose_box_size=1.2, obs_length=5, pred_length=8, if_consider_hip=False,
    )
    assert sk.num_nodes == 51 and int(sk.nodes_type_id.max()) + 1 == 43
    L = 8
    diffusion, den = create_diffusion(
        sk, diffusion_type="NonisotropicGaussianDiffusion", latent_size=L,
        diffusion_conditioning=True, diffusion_timesteps=2,
        diffusion_arch={"depth": 1, "attn_heads": 2, "attn_dim_head": 4,
                        "use_attention": True, "learn_influence": True,
                        "self_condition": False, "norm_type": "none"},
    )
    N = sk.num_nodes
    params = den.init(
        jax.random.key(0), jnp.zeros((2, N, L)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, N, L)),
    )
    out, _ = diffusion.sample(params, jax.random.key(1), batch_size=2,
                              x_cond=jnp.zeros((2, N, L)))
    assert out.shape == (2, N, L)
    assert np.isfinite(np.asarray(out)).all()
