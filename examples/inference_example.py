#!/usr/bin/env python
"""Inference example (script form of the reference's `Inference
Example.ipynb`): load a trained experiment, predict 50 futures for a raw
pose observation, rank them by closeness/diversity, and render an animation.

    python examples/inference_example.py --checkpoint <exp_dir> --dataset amass
"""
import argparse

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help="experiment dir (config.yaml + checkpoints)")
    p.add_argument("--dataset", default="amass")
    p.add_argument("--num-samples", type=int, default=50)
    p.add_argument("--out", default=None, help="optional .gif output for the animation")
    args = p.parse_args()

    from skeletondiffusion_tpu.inference import InferenceSession

    session = InferenceSession(args.checkpoint, args.dataset, num_samples=args.num_samples)
    sk = session.skeleton

    # shipped real observation (same demo inputs as the reference notebooks,
    # datasets/examples/README.md); falls back to a toy sequence for configs
    # with no packaged example
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    example_path = os.path.join(
        here, "datasets", "examples", f"example_obs_{args.dataset}.npy"
    )
    if os.path.exists(example_path) and sk.obs_length <= 30:
        # arrays store the full 52-joint SMPL-H set; the body model uses the
        # first `num_joints` (hands are appended after the body joints)
        obs = np.load(example_path)[0, -sk.obs_length:, : sk.num_joints]
        obs = obs.astype(np.float32)
        print(f"using shipped example observation {example_path}")
    else:
        obs = np.random.default_rng(0).standard_normal(
            (sk.obs_length, sk.num_joints, 3)
        ).astype(np.float32) * 0.2

    pred = session.predict(obs, rng=jax.random.key(0))  # [S, T, N, 3] metric space
    print("predictions:", pred.shape)

    # closest-to-GT + most diverse samples (here: GT := zero-velocity future)
    fake_future = np.repeat(obs[-1:], sk.pred_length, axis=0)
    closest, diverse, idx = session.rank(pred, fake_future, n_diverse=5)
    print("diverse sample indices:", idx)

    if args.out:
        from skeletondiffusion_tpu.utils.plot import animate_motion

        animate_motion([closest, diverse[0]], sk, titles=["closest", "diverse"],
                       out_path=args.out)
        print("saved", args.out)


if __name__ == "__main__":
    main()
