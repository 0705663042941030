#!/usr/bin/env python
"""Evaluation entry point; mirrors the reference CLI name (`eval.py`)."""
from skeletondiffusion_tpu.cli.eval import main

if __name__ == "__main__":
    main()
