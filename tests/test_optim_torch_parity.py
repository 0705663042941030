"""Direct optimizer- and subgradient-parity vs torch (no reference code, no
goldens — torch ships in the image): randomized multi-step trajectories for
both training stages' optimizer chains, and the influence-normalization
subgradient at the abs kink.

These harden what `test_train_objective_parity.py` pins once on real models:
a wrong beta, a decoupled-vs-coupled weight-decay swap, the optax-vs-torch
AMSGrad max ordering, or a subgradient-convention drift all fail here on
random tensors within a few steps.
"""
import numpy as np
import pytest
import torch


def _rand_tensors(rng, shapes):
    return [rng.standard_normal(s).astype(np.float32) for s in shapes]


SHAPES = [(7, 5), (5,), (3, 4, 2)]
STEPS = 10


def _torch_trajectory(opt_ctor, params0, grads_per_step, clip):
    ps = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params0]
    opt = opt_ctor(ps)
    norms = []
    for gs in grads_per_step:
        opt.zero_grad()
        for p, g in zip(ps, gs):
            p.grad = torch.from_numpy(g.copy())
        norms.append(float(torch.nn.utils.clip_grad_norm_(ps, clip)))
        opt.step()
    return [p.detach().numpy() for p in ps], norms


def _optax_trajectory(tx, lr, params0, grads_per_step):
    import jax
    import jax.numpy as jnp
    import optax

    params = [jnp.asarray(p) for p in params0]
    state = tx.init(params)
    for gs in grads_per_step:
        grads = [jnp.asarray(g) for g in gs]
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(
            params, jax.tree.map(lambda u: -lr * u, updates)
        )
    return [np.asarray(p) for p in params]


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_stage2_adam_chain_matches_torch(wd):
    """clip → coupled-L2 → Adam(β=(0.9,0.99)) ≡ torch.optim.Adam(weight_decay=·)
    preceded by clip_grad_norm_, over 10 random steps."""
    import optax

    lr, clip = 1e-3, 0.5
    rng = np.random.default_rng(0)
    params0 = _rand_tensors(rng, SHAPES)
    grads = [_rand_tensors(rng, SHAPES) for _ in range(STEPS)]

    want, _ = _torch_trajectory(
        lambda ps: torch.optim.Adam(ps, lr=lr, betas=(0.9, 0.99), weight_decay=wd),
        params0, grads, clip,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.add_decayed_weights(wd) if wd else optax.identity(),
        optax.scale_by_adam(b1=0.9, b2=0.99),
    )
    got = _optax_trajectory(tx, lr, params0, grads)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=1e-6, err_msg=f"wd={wd}")


def test_stage1_amsgrad_chain_matches_torch_adamw():
    """clip → torch-semantics amsgrad → decoupled decay ≡
    torch.optim.AdamW(amsgrad=True) preceded by clip_grad_norm_, over 10
    random steps.  optax.scale_by_amsgrad fails this within 2 steps (it maxes
    the bias-corrected ν̂; torch maxes the raw moment)."""
    import optax

    from skeletondiffusion_tpu.train.trainer_autoencoder import (
        scale_by_amsgrad_torch,
    )

    lr, wd, clip = 5e-3, 1e-2, 0.5
    rng = np.random.default_rng(1)
    params0 = _rand_tensors(rng, SHAPES)
    grads = [_rand_tensors(rng, SHAPES) for _ in range(STEPS)]

    want, _ = _torch_trajectory(
        lambda ps: torch.optim.AdamW(ps, lr=lr, amsgrad=True, weight_decay=wd),
        params0, grads, clip,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        scale_by_amsgrad_torch(),
        optax.add_decayed_weights(wd),
    )
    got = _optax_trajectory(tx, lr, params0, grads)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=1e-6)


def test_l1_normalize_rows_subgradient_matches_torch_at_kink():
    """d/dG of F.normalize(G, p=1, dim=1)-style rows at the identity init:
    every off-diagonal sits exactly at the |·| kink, where torch's abs
    subgradient is 0 (sign(0)=0) and naive jnp.abs's is 1.  Pin ours to
    torch's convention — this decides the whole G gradient at init (finite
    differences agree with torch)."""
    import jax
    import jax.numpy as jnp

    from skeletondiffusion_tpu.ops.graph_linear import l1_normalize_rows

    N = 5
    rng = np.random.default_rng(2)
    cot = rng.standard_normal((N, N)).astype(np.float32)  # upstream cotangent

    G_t = torch.eye(N, requires_grad=True)
    out_t = torch.nn.functional.normalize(G_t, p=1.0, dim=1)
    out_t.backward(torch.from_numpy(cot))

    def f(G):
        return jnp.sum(l1_normalize_rows(G) * jnp.asarray(cot))

    grad = jax.grad(f)(jnp.eye(N))
    np.testing.assert_allclose(np.asarray(grad), G_t.grad.numpy(), atol=1e-6)

    # and off the kink the two still agree on a generic matrix
    G0 = rng.standard_normal((N, N)).astype(np.float32)
    G_t = torch.from_numpy(G0.copy()).requires_grad_(True)
    torch.nn.functional.normalize(G_t, p=1.0, dim=1).backward(torch.from_numpy(cot))
    grad = jax.grad(f)(jnp.asarray(G0))
    np.testing.assert_allclose(np.asarray(grad), G_t.grad.numpy(), atol=1e-5)
