"""CLI entry points (L7): train_autoencoder, train_diffusion, eval."""
