"""Profiling: jax.profiler traces + MFU from the FLOP model.

The reference's only instrumentation is wall-clock spans
(`/root/reference/train.py:72,107-110,141-143,430-438`); here a real device
trace (`jax.profiler`) can wrap any step range, and MFU is derived from
utils/flops.py — the north-star metric (BASELINE.md).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

from video_diffusion_speedrun_tpu.core.config import DiTConfig
from video_diffusion_speedrun_tpu.utils.flops import (
    dit_train_flops,
    peak_flops_for,
)


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace for the enclosed steps (viewable in
    tensorboard / xprof); no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def train_mfu(cfg: DiTConfig, batch: int, t: int, h: int, w: int,
              step_seconds: float, n_devices: Optional[int] = None,
              context_len: int = 512) -> float:
    n = n_devices or len(jax.devices())
    flops = dit_train_flops(cfg, batch, t, h, w, context_len)
    peak = peak_flops_for(jax.devices()[0].device_kind) * n
    return flops / step_seconds / peak
