"""Shared helpers for the Pallas attention kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pad_dim(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    """Zero-pad `axis` up to the next multiple."""
    size = x.shape[axis]
    pad = cdiv(size, multiple) * multiple - size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def fit_block(length: int, block: int) -> int:
    """128-aligned near-equal blocking that minimizes tail padding (e.g.
    L=1040 with block=1024 → two 640-blocks (pad 240) instead of two 1024s
    (pad 1008))."""
    nb = max(1, cdiv(length, block))
    return cdiv(cdiv(length, nb), 128) * 128


def interpret_mode() -> bool:
    """Run kernels in the Pallas interpreter off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def fit_block_div(length: int, max_block: int, align: int = 16) -> int:
    """Pad-free row blocking: smallest split count nb with block = L/nb ≤
    max_block, L % nb == 0 and block % align == 0 — so the grid tiles L
    exactly (no `pad` op, no output slice copy). Falls back to the
    minimal-padding `align`-aligned block when L has no suitable divisor."""
    if length <= max_block and length % align == 0:
        return length
    for nb in range(max(1, cdiv(length, max_block)), min(length, 64) + 1):
        if length % nb == 0 and (length // nb) % align == 0 \
                and length // nb <= max_block:
            return length // nb
    nb = max(1, cdiv(length, max_block))
    return cdiv(cdiv(length, nb), align) * align
