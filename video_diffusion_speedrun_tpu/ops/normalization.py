"""RMSNorm, computed in fp32 regardless of input dtype.

Semantics of the reference RMSNorm (`/root/reference/model.py:25-41`):
eps=1e-6, mean-of-squares over the last dim, optional trainable scale
(gated by the model's `train_bias_and_rms` flag), output cast back to the
input dtype. XLA fuses this into neighbouring ops; no custom kernel needed.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def rms_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    norm = lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    out = xf * norm
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    return out.astype(orig_dtype)
