"""Axis-factored 3D rotary position embedding.

Semantics of the reference `ThreeDimRotary` + `apply_rotary_emb`
(`/root/reference/model.py:189-275`): base=100; per-head rotary dim
d = head_dim/2, split d/2 time + d/4 height + d/4 width; random 3D
crop-offset augmentation of the position grid every forward
(`model.py:224-226`); register tokens prepended with identity rotation
cos=1 / sin=0 (`model.py:243-262`); fp32 half-split (non-interleaved)
rotation with the reference's (+sin, −sin) convention (`model.py:266-275`).

TPU-first difference: the reference materializes a full 128×128×128×d cos/sin
buffer (~0.5 GB each at head_dim 128, `model.py:216-217`) and dynamically
slices it. We compute the cos/sin for the *actual* (T, H, W) extent directly
from the (traced) crop offsets — three small outer products and a broadcast —
which is HBM-free and jit-friendly (offsets are data, not shapes, so no
recompilation across random crops).

Token-order modes (see SURVEY.md §Quirks #1):
  "reference" — flatten the position grid (t, h, w) row-major, reproducing the
                reference's mismatch against the (h, w, t) patchify token order.
  "matched"   — flatten (h, w, t), geometrically correct.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rope_inv_freqs(head_dim: int, base: float = 100.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse frequencies for (space, time) axes.

    `dim` below is the reference's rotary dim = head_dim/2
    (`model.py:310-311`): inv_freq_space = base^-(arange(0,dim,4)/dim) (len dim/4),
    inv_freq_time = base^-(arange(0,dim,2)/dim) (len dim/2) (`model.py:192-193`).
    """
    dim = head_dim // 2
    inv_freq_space = 1.0 / (base ** (jnp.arange(0, dim, 4, dtype=jnp.float32) / dim))
    inv_freq_time = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    return inv_freq_space, inv_freq_time


def rope_cos_sin(
    head_dim: int,
    grid_t: int,
    grid_h: int,
    grid_w: int,
    offsets: jnp.ndarray,
    *,
    base: float = 100.0,
    num_registers: int = 0,
    order: str = "matched",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build [num_registers + grid_t·grid_h·grid_w, head_dim/2] fp32 cos/sin.

    `offsets` is an int array [3] = (start_t, start_h, start_w) — the random
    crop augmentation positions (reference `model.py:224-226`); may be traced.
    """
    inv_space, inv_time = rope_inv_freqs(head_dim, base)
    offsets = offsets.astype(jnp.float32)
    pos_t = offsets[0] + jnp.arange(grid_t, dtype=jnp.float32)
    pos_h = offsets[1] + jnp.arange(grid_h, dtype=jnp.float32)
    pos_w = offsets[2] + jnp.arange(grid_w, dtype=jnp.float32)

    freqs_t = pos_t[:, None] * inv_time[None, :]   # [T, d/2]
    freqs_h = pos_h[:, None] * inv_space[None, :]  # [H, d/4]
    freqs_w = pos_w[:, None] * inv_space[None, :]  # [W, d/4]

    # Broadcast to the full [T, H, W, d] grid, feature order (t ‖ h ‖ w)
    # matching the reference concat (`model.py:214`).
    ft = jnp.broadcast_to(freqs_t[:, None, None, :], (grid_t, grid_h, grid_w, freqs_t.shape[-1]))
    fh = jnp.broadcast_to(freqs_h[None, :, None, :], (grid_t, grid_h, grid_w, freqs_h.shape[-1]))
    fw = jnp.broadcast_to(freqs_w[None, None, :, :], (grid_t, grid_h, grid_w, freqs_w.shape[-1]))
    freqs = jnp.concatenate([ft, fh, fw], axis=-1)  # [T, H, W, d]

    if order == "reference":
        flat = freqs.reshape(grid_t * grid_h * grid_w, -1)
    elif order == "matched":
        flat = freqs.transpose(1, 2, 0, 3).reshape(grid_t * grid_h * grid_w, -1)
    else:
        raise ValueError(f"unknown rope order: {order}")

    cos = jnp.cos(flat)
    sin = jnp.sin(flat)
    if num_registers > 0:
        # Identity rotation for register tokens (`model.py:243-262`).
        cos = jnp.concatenate(
            [jnp.ones((num_registers, cos.shape[-1]), jnp.float32), cos], axis=0
        )
        sin = jnp.concatenate(
            [jnp.zeros((num_registers, sin.shape[-1]), jnp.float32), sin], axis=0
        )
    return cos, sin


def random_rope_offsets(
    rng: jax.Array,
    grid_t: int,
    grid_h: int,
    grid_w: int,
    max_t: int = 128,
    max_h: int = 128,
    max_w: int = 128,
) -> jnp.ndarray:
    """Random crop offsets, uniform over [0, max-extent] inclusive
    (`model.py:224-226`)."""
    kt, kh, kw = jax.random.split(rng, 3)
    return jnp.stack(
        [
            jax.random.randint(kt, (), 0, max_t - grid_t + 1),
            jax.random.randint(kh, (), 0, max_h - grid_h + 1),
            jax.random.randint(kw, (), 0, max_w - grid_w + 1),
        ]
    )


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate q/k in fp32: x [B, nH, L, head_dim]; cos/sin [L, head_dim/2].

    Reference convention (`model.py:266-275`): y1 = x1·cos + x2·sin,
    y2 = −x1·sin + x2·cos (rotation by −θ vs the usual convention).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    d = xf.shape[-1] // 2
    x1, x2 = xf[..., :d], xf[..., d:]
    c = cos[None, None, :, :]
    s = sin[None, None, :, :]
    y1 = x1 * c + x2 * s
    y2 = -x1 * s + x2 * c
    return jnp.concatenate([y1, y2], axis=-1).astype(orig_dtype)
