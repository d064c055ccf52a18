"""Tracing / profiling / numerical-debug helpers.

SURVEY.md SS5.1-SS5.2: the reference has only wall-clock meters and no
sanitizers; the rebuild provides

- ``profile_trace``: a ``jax.profiler`` trace context writing a
  tensorboard-profile directory (view with ``tensorboard --logdir``),
- ``timed``: a block timer that *synchronizes through a device->host
  transfer* -- on the axon TPU tunnel ``block_until_ready`` returns early,
  so device_get is the only reliable fence (measured in round 1; see
  bench.py),
- ``debug_mode``: enables ``jax_debug_nans`` / ``jax_disable_jit`` for
  fast fault isolation (the race-detector/sanitizer analogue).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def profile_trace(logdir: str | Path):
    """jax.profiler trace around a block (tensorboard-profile format)."""
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(sync_value=None):
    """Wall-clock a block; fences on ``sync_value`` via device_get."""
    box = {}
    t0 = time.perf_counter()
    yield box
    if sync_value is not None:
        jax.device_get(sync_value)
    box["seconds"] = time.perf_counter() - t0


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """NaN-checking (and optionally op-by-op) execution for debugging."""
    old_nans = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        if disable_jit:
            with jax.disable_jit():
                yield
        else:
            yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
