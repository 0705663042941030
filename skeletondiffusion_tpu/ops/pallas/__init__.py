"""Pallas TPU kernels for the hot ops (flag-gated; every kernel has a pure
XLA reference path and an interpret-mode test)."""
from .gru_rollout import decode_rollout, gru_rollout_pallas

__all__ = ["decode_rollout", "gru_rollout_pallas"]
