"""Timestep embedding.

Sinusoidal embedding of continuous t ∈ [0, 1] — semantics of the reference
`timestep_embedding` (`/root/reference/model.py:12-22`): max_period=10000,
cos‖sin concatenation, computed in fp32.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """[B] float timesteps → [B, dim] fp32 embedding (cos ‖ sin)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
