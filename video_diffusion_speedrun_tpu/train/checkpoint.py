"""Checkpointing: orbax sharded save/load + torch-checkpoint import.

Upgrades the reference's DCP weights-only checkpoints
(`/root/reference/train.py:553,581-584` — no optimizer/step/RNG; "resume"
restarts the schedule, SURVEY.md §Quirks #8): orbax saves the FULL TrainState
(params + Adam moments + step), sharded and async-capable, restoring onto an
arbitrary mesh.

`load_reference_checkpoint` cross-loads checkpoints produced by the torch
reference (DCP dirs or consolidated .pt files) through models/convert.py, so
a reference user can bring their runs along.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _manager(directory: str, max_to_keep: Optional[int] = None):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        ),
    )


class CheckpointManager:
    """Thin orbax wrapper: save(step, state) / restore(step, template)."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self._mgr = _manager(directory, max_to_keep)

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: Optional[int], template: Any) -> Any:
        """Restore with the template's shardings (template = abstract or
        concrete TrainState; shapes/shardings taken from it)."""
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape") else x,
            template,
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def restore_from_metadata(self, step: Optional[int]) -> Any:
        """Restore WITHOUT a caller-supplied template: the abstract tree is
        derived from the checkpoint's own item metadata (shapes/dtypes as
        saved; custom pytree nodes come back as plain dicts). This makes
        params-only consumers (sampling) independent of which optimizer
        variant wrote the state — an in_backward/factored-nu checkpoint
        restores the same as a standard-AdamW one."""
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        meta = self._mgr.item_metadata(step)
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype)
            if hasattr(m, "shape") else m,
            meta,
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def is_orbax_checkpoint(path: str) -> bool:
    """True for directories produced by our CheckpointManager — either the
    run root (digit step subdirs) or a single step dir inside it — as opposed
    to torch DCP dirs / .pt files."""
    if not os.path.isdir(path):
        return False
    entries = os.listdir(path)
    if any(e.isdigit() and os.path.isdir(os.path.join(path, e))
           for e in entries):
        return True
    # a step dir: .../run/<step>/ with orbax metadata inside
    return os.path.basename(os.path.normpath(path)).isdigit() and any(
        e.startswith("_CHECKPOINT") or e == "state" for e in entries
    )


def is_torch_reference_checkpoint(path: str) -> bool:
    """True for checkpoints produced by the torch reference: a DCP dir
    (`.distcp` shards), a dir holding its converted `temp.pt`, or a bare
    `.pt` file (`/root/reference/train.py:292-320`)."""
    if path.endswith(".pt"):
        return True
    if not os.path.isdir(path):
        return False
    entries = os.listdir(path)
    return "temp.pt" in entries or any(e.endswith(".distcp") for e in entries)


def restore_params_for_inference(path: str, train_cfg=None) -> Any:
    """Restore only the model params from a full-TrainState orbax checkpoint
    (for sampling: the optimizer state is not needed). The restore template
    comes from the checkpoint's own metadata, so ANY optimizer variant's
    state restores (standard AdamW, bf16 moments, optimizer-in-backward
    with factored nu); `train_cfg` is unused and kept for API stability."""
    del train_cfg

    step = None
    base = os.path.basename(os.path.normpath(path))
    if base.isdigit():  # a specific step dir was passed; use its run root
        step = int(base)
        path = os.path.dirname(os.path.normpath(path))

    mgr = CheckpointManager(path)
    state = mgr.restore_from_metadata(step)
    mgr.close()
    # custom pytree nodes (TrainState) come back as plain dicts
    return state["params"] if isinstance(state, dict) else state.params


def load_reference_checkpoint(path: str, cfg) -> Any:
    """Load a torch reference checkpoint (DCP dir or .pt) into our DiT param
    tree (the `dcp_to_torch_save` + prefix-strip load path,
    `train.py:292-320`, done offline and torch-CPU-only)."""
    import torch

    from video_diffusion_speedrun_tpu.models.convert import torch_dit_to_params

    if os.path.isdir(path):
        pt = os.path.join(path, "temp.pt")
        if not os.path.exists(pt):
            from torch.distributed.checkpoint.format_utils import (
                dcp_to_torch_save,
            )

            dcp_to_torch_save(path, pt)
        state_dict = torch.load(pt, map_location="cpu", weights_only=True)
    else:
        state_dict = torch.load(path, map_location="cpu", weights_only=True)

    state_dict = {
        k.replace("module.", "").replace("_orig_mod.", ""): v
        for k, v in state_dict.items()
    }
    return torch_dit_to_params(state_dict, cfg)
