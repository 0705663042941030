"""Cross-cutting utils (LX): config, reproducibility, logging, storage,
torch-checkpoint porting."""
from .debug import configure_debug, profile_trace
from .config import (
    flatten_config,
    load_and_merge_autoenc_cfg,
    load_config,
    save_config,
)
from .logging import AverageTimer, MetricsLogger
from .reproducibility import epoch_key, iteration_key, set_seed
from .store import ResultStorer
from .torch_port import port_autoencoder, port_denoiser

__all__ = [
    "AverageTimer", "MetricsLogger", "ResultStorer", "configure_debug", "epoch_key",
    "flatten_config", "iteration_key", "load_and_merge_autoenc_cfg",
    "load_config", "port_autoencoder", "port_denoiser", "profile_trace", "save_config",
    "set_seed",
]
