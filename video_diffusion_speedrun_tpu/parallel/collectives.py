"""Cross-host/device collective helpers.

The reference's NCCL usage is: scalar all-reduce AVG for metric averaging
(`/root/reference/utils.py:11-15`), barriers around checkpoint I/O
(`train.py:302,319,331,547`), and FSDP's implicit gathers. On TPU, in-program
collectives are XLA ops inserted by GSPMD (see parallel/fsdp.py); what's left
for host code is tiny and lives here.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def avg_scalar_across_hosts(value: float) -> float:
    """Mean of a host-local python scalar across processes — the
    `avg_scalar_across_ranks` analog (`utils.py:11-15`). In-program metrics
    don't need this (a sharded-mean loss is already globally averaged); use
    it for host-side aggregates only."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(value, np.float32))
    return float(np.mean(arr))


def barrier(name: str = "barrier") -> None:
    """Host barrier — the `dist.barrier()` analog (`train.py:302,319`).
    In-SPMD programs don't need barriers; use around host-side I/O."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def psum_scalar(x: jnp.ndarray, axis_names: Sequence[str]) -> jnp.ndarray:
    """In-program scalar sum over mesh axes (for use inside shard_map)."""
    return jax.lax.psum(x, tuple(axis_names))
