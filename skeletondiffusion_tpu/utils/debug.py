"""Debug & profiling toggles — the TPU equivalents of the reference's
auxiliary subsystems (SURVEY.md §5):

* ``configure_debug``: jax debug_nans / enable_checks, mirroring the
  reference's ``torch.autograd.set_detect_anomaly`` flag
  (`train_diffusion.py:33-37`) and forced-deterministic-algorithms setting
  (`src/utils/reproducibility.py:13`).
* ``profile_trace``: a context manager around ``jax.profiler`` traces —
  replaces the reference's wall-clock-only ``AverageTimer``
  (`src/utils/time.py:5-20`) with real device traces viewable in
  TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


def configure_debug(if_debug_nans: bool = False, if_enable_checks: bool = False):
    """Config-driven runtime checks; keys ``if_debug_nans`` /
    ``if_enable_checks`` in the training configs."""
    if if_debug_nans:
        jax.config.update("jax_debug_nans", True)
    if if_enable_checks:
        jax.config.update("jax_enable_checks", True)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """``with profile_trace('/tmp/trace'):`` captures a device trace for the
    enclosed steps; no-op when ``log_dir`` is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
