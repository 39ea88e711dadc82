"""torch DiT checkpoint → our parameter pytree.

Maps the reference's module names (`/root/reference/model.py:44-356`) onto
our tree (models/dit.py): Linear weights transpose [out,in]→[in,out]; the
Conv3d patch kernel [D,C,pt,p,p] flattens to our [C·pt·p·p, D]
(ops/patchify.py layout note); per-block tensors stack along a leading depth
axis for lax.scan.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from video_diffusion_speedrun_tpu.core.config import DiTConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach()
    if hasattr(t, "float"):
        t = t.float()
    if hasattr(t, "numpy"):
        return t.numpy()
    return np.asarray(t, np.float32)


def torch_dit_to_params(state_dict: Dict[str, Any], cfg: DiTConfig) -> Dict:
    """Convert a reference DiT state dict (name → tensor) to our pytree."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def lin(name):
        return jnp.asarray(sd[name].T)

    def vec(name):
        return jnp.asarray(sd[name])

    d = cfg.hidden_size
    conv_w = sd["patch_embed.patch_proj.weight"]  # [D, C, pt, p, p]
    params: Dict[str, Any] = {
        "patch_proj": {
            "weight": jnp.asarray(conv_w.reshape(d, -1).T),
            "bias": vec("patch_embed.patch_proj.bias"),
        },
        "register_tokens": vec("register_tokens"),
        "time_embed": {
            "fc1": {"weight": lin("time_embed.0.weight"),
                    "bias": vec("time_embed.0.bias")},
            "fc2": {"weight": lin("time_embed.2.weight"),
                    "bias": vec("time_embed.2.bias")},
        },
        "final_modulation": {
            "weight": lin("final_modulation.1.weight"),
            "bias": vec("final_modulation.1.bias"),
        },
        "final_norm": (
            {"scale": vec("final_norm.weight")}
            if "final_norm.weight" in sd else {}
        ),
        "final_proj": {
            "weight": lin("final_proj.weight"),
            "bias": vec("final_proj.bias"),
        },
    }
    if "positional_embedding" in sd:
        params["positional_embedding"] = vec("positional_embedding")

    blocks = []
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        blk: Dict[str, Any] = {
            "norm1": ({"scale": vec(f"{p}.norm1.weight")}
                      if f"{p}.norm1.weight" in sd else {}),
            "qkv": {"weight": lin(f"{p}.qkv.weight")},
            "attn_proj": {"weight": lin(f"{p}.attn_proj.weight")},
            "norm3": ({"scale": vec(f"{p}.norm3.weight")}
                      if f"{p}.norm3.weight" in sd else {}),
            "mlp": {
                "fc1": {"weight": lin(f"{p}.mlp.0.weight"),
                        "bias": vec(f"{p}.mlp.0.bias")},
                "fc2": {"weight": lin(f"{p}.mlp.2.weight"),
                        "bias": vec(f"{p}.mlp.2.bias")},
            },
            "adaLN_modulation": {
                "weight": lin(f"{p}.adaLN_modulation.1.weight"),
                "bias": vec(f"{p}.adaLN_modulation.1.bias"),
            },
        }
        if f"{p}.qkv.bias" in sd:
            blk["qkv"]["bias"] = vec(f"{p}.qkv.bias")
        if f"{p}.lambda_param" in sd:
            blk["lambda_param"] = vec(f"{p}.lambda_param")
        if f"{p}.q_cross.weight" in sd:
            blk["norm2"] = ({"scale": vec(f"{p}.norm2.weight")}
                            if f"{p}.norm2.weight" in sd else {})
            blk["q_cross"] = {"weight": lin(f"{p}.q_cross.weight")}
            if f"{p}.q_cross.bias" in sd:
                blk["q_cross"]["bias"] = vec(f"{p}.q_cross.bias")
            blk["context_kv"] = {"weight": lin(f"{p}.context_kv.weight")}
            if f"{p}.context_kv.bias" in sd:
                blk["context_kv"]["bias"] = vec(f"{p}.context_kv.bias")
            blk["cross_proj"] = {"weight": lin(f"{p}.cross_proj.weight")}
        blocks.append(blk)

    import jax

    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)
    return params
