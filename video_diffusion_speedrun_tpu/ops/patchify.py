"""3D patchify / unpatchify as reshape + matmul.

The reference patchifies with a strided Conv3d (`/root/reference/model.py:170-186`,
kernel == stride) — on TPU a kernel==stride conv is exactly a block-reshape
followed by a dense projection, which maps straight onto the MXU with no
conv lowering. Token order matches the reference: "b c t h w -> b (h w t) c"
(t fastest; `model.py:185`). Unpatchify inverts the reference's
"b (h w t) (p1 p2 p3 c) -> b c (t p3) (h p1) (w p2)" (`model.py:392-401`).

Weight layout note (for torch-checkpoint conversion): torch's Conv3d weight is
[D, C, pt, p, p]; our `kernel` is the flattened transpose [C*pt*p*p, D] with the
patch feature vector ordered (c, kt, kh, kw) — identical contraction order, so
`kernel = torch_w.reshape(D, -1).T`.
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(x: jnp.ndarray, pt: int, p: int) -> jnp.ndarray:
    """[B, C, T, H, W] → [B, (H/p · W/p · T/pt), C·pt·p·p] with t-fastest token
    order and (c, kt, kh, kw) feature order.

    Non-multiple extents are floor-cropped, matching strided-Conv3d semantics
    (relevant for real Cosmos latents, whose frame count is 1+4k — odd — so a
    2× time patchify drops the trailing frame)."""
    b, c, t, h, w = x.shape
    gt, gh, gw = t // pt, h // p, w // p
    x = x[:, :, : gt * pt, : gh * p, : gw * p]
    x = x.reshape(b, c, gt, pt, gh, p, gw, p)
    # → [B, gh, gw, gt, C, pt, p, p]
    x = x.transpose(0, 4, 6, 2, 1, 3, 5, 7)
    return x.reshape(b, gh * gw * gt, c * pt * p * p)


def patchify(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None,
             pt: int, p: int, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Patch embedding: extract patches then dense-project [patch_dim → D]."""
    patches = extract_patches(x, pt, p).astype(compute_dtype)
    out = jnp.dot(patches, kernel.astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(compute_dtype)


def unpatchify(tokens: jnp.ndarray, grid_t: int, grid_h: int, grid_w: int,
               pt: int, p: int, channels: int) -> jnp.ndarray:
    """[B, (h w t), p·p·pt·c] → [B, C, T, H, W].

    Feature order is (p1, p2, p3, c) = (kh, kw, kt, c) with c fastest —
    matching the reference final projection layout (`model.py:344-346,392-401`).
    """
    b, l, f = tokens.shape
    assert l == grid_h * grid_w * grid_t, (l, grid_t, grid_h, grid_w)
    assert f == p * p * pt * channels, (f, p, pt, channels)
    x = tokens.reshape(b, grid_h, grid_w, grid_t, p, p, pt, channels)
    # [B, gh, gw, gt, p1, p2, p3, c] → [B, c, gt, p3, gh, p1, gw, p2]
    x = x.transpose(0, 7, 3, 6, 1, 4, 2, 5)
    return x.reshape(b, channels, grid_t * pt, grid_h * p, grid_w * p)
