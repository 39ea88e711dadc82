"""Device mesh construction.

TPU-native replacement for the reference's torch DeviceMesh
(`/root/reference/model.py:475-498`): a `jax.sharding.Mesh` with axes
(replica, fsdp, tensor). On multi-slice deployments the `replica` axis should
map to DCN and `fsdp`/`tensor` to ICI; `jax.experimental.mesh_utils` handles
the physical layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_diffusion_speedrun_tpu.core.config import MeshConfig

AXIS_REPLICA = "replica"
AXIS_FSDP = "fsdp"
AXIS_CONTEXT = "context"
AXIS_TENSOR = "tensor"
MESH_AXES = (AXIS_REPLICA, AXIS_FSDP, AXIS_CONTEXT, AXIS_TENSOR)

# Axes over which the global batch is data-parallel.
DATA_AXES = (AXIS_REPLICA, AXIS_FSDP)


def build_mesh(
    config: MeshConfig | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (replica, fsdp, tensor) mesh over all (or given) devices.

    Unlike the reference's `get_device_mesh` (`model.py:475-498`), this works at
    world size 1 (the reference raises NameError there, `model.py:489`) and the
    axis sizes are configurable rather than hardcoded to (1, world, 1).
    """
    config = config or MeshConfig()
    if devices is None:
        devices = jax.devices()
    cfg = config.resolve(len(devices))
    shape = (cfg.replica, cfg.fsdp, cfg.context, cfg.tensor)
    try:
        # ICI-topology-aware placement when possible
        device_array = mesh_utils.create_device_mesh(shape, devices=list(devices))
    except Exception:  # arbitrary subsets can fail in backend-specific ways
        device_array = np.asarray(list(devices)).reshape(shape)
    return Mesh(device_array, MESH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Global-batch sharding: batch dim split over (replica, fsdp)."""
    return NamedSharding(mesh, P(DATA_AXES))


def batch_pspec() -> P:
    return P(DATA_AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def token_pspec() -> P:
    """Context-parallel activation spec: [B, L, D] with tokens over the
    `context` axis (sequence parallelism — absent from the reference,
    SURVEY.md §2b)."""
    return P(DATA_AXES, AXIS_CONTEXT, None)


def local_batch_slice(mesh: Mesh, global_batch: int) -> int:
    """Per-data-shard batch size."""
    data = mesh.shape[AXIS_REPLICA] * mesh.shape[AXIS_FSDP]
    if global_batch % data != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data={data}")
    return global_batch // data
