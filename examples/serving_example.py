#!/usr/bin/env python
"""Serving example: export a trained experiment to a self-contained AOT
artifact (StableHLO + weights), then serve predictions from the artifact
alone — no model-construction code on the serving host.

    # offline, once:
    python examples/serving_example.py export --checkpoint <exp_dir> \
        --artifact artifact/ --batch-size 256
    # on the server:
    python examples/serving_example.py serve --artifact artifact/
"""
import argparse

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=("export", "serve"))
    p.add_argument("--artifact", required=True)
    p.add_argument("--checkpoint", help="experiment dir (export mode)")
    p.add_argument("--dataset", default="amass")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--num-samples", type=int, default=50)
    args = p.parse_args()

    if args.mode == "export":
        from skeletondiffusion_tpu.inference import InferenceSession
        from skeletondiffusion_tpu.serving import export_predictor

        session = InferenceSession(args.checkpoint, args.dataset,
                                   num_samples=args.num_samples)
        export_predictor(session.predictor, args.artifact,
                         batch_size=args.batch_size)
        print(f"exported {args.artifact} (batch {args.batch_size}, "
              f"{args.num_samples} samples)")
        return

    from skeletondiffusion_tpu.serving import ServingModel

    model = ServingModel(args.artifact)
    B, (T, J, _) = model.batch_size, model.manifest["obs_tail_shape"]
    # toy input-space observation: in practice transform raw poses with the
    # skeleton's transform (see examples/inference_example.py)
    obs = np.random.default_rng(0).standard_normal((B, T, J, 3)).astype(np.float32) * 0.2
    pred = model(jax.random.key(0), obs)
    print(f"served predictions: {pred.shape} "
          f"({model.num_samples} futures per observation)")


if __name__ == "__main__":
    main()
