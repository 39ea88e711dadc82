"""Attention dispatch: Pallas flash attention on TPU, XLA attention elsewhere.

Replaces the reference's `F.scaled_dot_product_attention` calls
(`/root/reference/model.py:136,157`) — one entry point for both the long
spatiotemporal self-attention and the 512-token cross-attention.

`dot_product_attention` is the XLA path: a plain einsum-softmax-einsum that XLA
fuses well at moderate sequence lengths and that serves as the numerical
reference for the Pallas kernel's tests. The Pallas path (ops/flash_attention.py)
is the O(L)-memory hot-path kernel used for long video token sequences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
) -> jnp.ndarray:
    """[B, H, Lq, D] x [B, H, Lk, D] x [B, H, Lk, D] → [B, H, Lq, D].

    Matches torch SDPA defaults (`model.py:136`): scale = D^-0.5, no mask,
    softmax accumulated in fp32.
    """
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


@functools.lru_cache(maxsize=1)
def _pallas_available() -> bool:
    return jax.default_backend() == "tpu"


# Below this q-length XLA's fused attention wins (measured on v5e: at
# L≈1k the XLA path is ~12% faster than the Pallas kernel; the Pallas
# kernel's O(L) memory is what matters at video lengths L ≳ 4k where XLA
# would materialize L² logits).
PALLAS_MIN_SEQ = 4096


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    impl: str = "auto",
) -> jnp.ndarray:
    """Fused attention entry point. impl: auto | pallas | xla."""
    if impl == "auto":
        impl = (
            "pallas"
            if _pallas_available() and q.shape[2] >= PALLAS_MIN_SEQ
            else "xla"
        )
    if impl == "pallas":
        from video_diffusion_speedrun_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v)
    if impl == "xla":
        return dot_product_attention(q, k, v)
    raise ValueError(f"unknown attention impl: {impl}")
