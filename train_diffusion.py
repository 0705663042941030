#!/usr/bin/env python
"""Stage-2 training entry point; mirrors the reference CLI name
(`train_diffusion.py`)."""
from skeletondiffusion_tpu.cli.train_diffusion import main

if __name__ == "__main__":
    main()
