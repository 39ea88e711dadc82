"""Process-0 logging + metrics sinks.

The reference logs through a rank-0 Python logger + wandb
(`/root/reference/train.py:269-284,377-386,441-500`). Here: same timestamped
rank-0 logger; metrics go to wandb when available AND to a local
metrics.jsonl (the offline default — wandb isn't in the TPU image).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax


def is_main_process() -> bool:
    return jax.process_index() == 0


def make_logger(name: str = "vds_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False  # avoid double logging via the root handler
    if is_main_process() and not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
        ))
        logger.addHandler(handler)
    return logger


class MetricsLogger:
    """wandb (if importable + enabled) + jsonl sink; no-ops off process 0."""

    def __init__(self, project: str, run_name: str, config: Dict,
                 out_dir: str, use_wandb: bool = False):
        self.enabled = is_main_process()
        self.wandb = None
        self._file = None
        if not self.enabled:
            return
        os.makedirs(out_dir, exist_ok=True)
        self._file = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project, name=run_name, config=config)
                self.wandb = wandb
            except Exception as e:  # wandb not installed / offline
                logging.getLogger(__name__).warning("wandb unavailable: %s", e)

    def log(self, metrics: Dict, step: int) -> None:
        if not self.enabled:
            return
        record = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            record[k] = float(v) if hasattr(v, "__float__") else v
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def finish(self) -> None:
        if self._file is not None:
            self._file.close()
        if self.wandb is not None:
            self.wandb.finish()


class StepTimer:
    """Per-N-step average step timer (`train.py:397,441-451` semantics)."""

    def __init__(self, every: int = 10):
        self.every = every
        self._t0: Optional[float] = None  # set at the first tick
        self._steps = 0
        self._window = 0
        self.avg_ms: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        self._steps += 1
        if self._t0 is None:
            # first completed step: start the window HERE so the step-0 jit
            # compile and loader startup never enter a per-step average (the
            # first reported avg would otherwise read seconds, not ms)
            self._t0 = now
            return None
        self._window += 1
        if self._steps % self.every == 0:
            self.avg_ms = (now - self._t0) / self._window * 1000
            self._t0 = now
            self._window = 0
            return self.avg_ms
        return None
