"""Networks (L1): AutoEncoder and Denoiser; reference
`src/core/network/nn/__init__.py:1-2`."""
from .autoencoder import AutoEncoder, Decoder, Encoder, autoencoder_loss
from .denoiser import Denoiser

__all__ = ["AutoEncoder", "Decoder", "Denoiser", "Encoder", "autoencoder_loss"]
