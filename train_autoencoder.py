#!/usr/bin/env python
"""Stage-1 training entry point; mirrors the reference CLI name
(`train_autoencoder.py`).  Usage: python train_autoencoder.py dataset=amass ..."""
from skeletondiffusion_tpu.cli.train_autoencoder import main

if __name__ == "__main__":
    main()
