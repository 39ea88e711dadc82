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


def params_to_torch_dit(params: Dict[str, Any], cfg: DiTConfig
                        ) -> Dict[str, np.ndarray]:
    """Inverse of `torch_dit_to_params`: our pytree → a reference-named
    state dict (numpy; wrap in torch.Tensor to `load_state_dict` into the
    reference DiT). Lets TPU-trained checkpoints flow back into the torch
    ecosystem (fine-tuning, side-by-side eval) — the reference has no
    equivalent import path at all."""
    import jax

    d = cfg.hidden_size
    out: Dict[str, np.ndarray] = {}

    def put_lin(name, leaf, bias=None):
        out[name + ".weight"] = np.asarray(leaf, np.float32).T
        if bias is not None:
            out[name + ".bias"] = np.asarray(bias, np.float32)

    pp = params["patch_proj"]
    # [C·pt·p·p, D] → conv kernel [D, C, pt, p, p]
    out["patch_embed.patch_proj.weight"] = (
        np.asarray(pp["weight"], np.float32).T.reshape(
            d, cfg.in_channels, cfg.time_patch_size, cfg.patch_size,
            cfg.patch_size)
    )
    out["patch_embed.patch_proj.bias"] = np.asarray(pp["bias"], np.float32)
    out["register_tokens"] = np.asarray(params["register_tokens"], np.float32)
    put_lin("time_embed.0", params["time_embed"]["fc1"]["weight"],
            params["time_embed"]["fc1"]["bias"])
    put_lin("time_embed.2", params["time_embed"]["fc2"]["weight"],
            params["time_embed"]["fc2"]["bias"])
    put_lin("final_modulation.1", params["final_modulation"]["weight"],
            params["final_modulation"]["bias"])
    if "scale" in params["final_norm"]:
        out["final_norm.weight"] = np.asarray(
            params["final_norm"]["scale"], np.float32)
    put_lin("final_proj", params["final_proj"]["weight"],
            params["final_proj"]["bias"])
    if "positional_embedding" in params:
        out["positional_embedding"] = np.asarray(
            params["positional_embedding"], np.float32)

    blocks = params["blocks"]
    depth = jax.tree.leaves(blocks)[0].shape[0]
    for i in range(depth):
        blk = jax.tree.map(lambda x: x[i], blocks)
        p = f"blocks.{i}"
        if "scale" in blk["norm1"]:
            out[f"{p}.norm1.weight"] = np.asarray(blk["norm1"]["scale"],
                                                  np.float32)
        put_lin(f"{p}.qkv", blk["qkv"]["weight"], blk["qkv"].get("bias"))
        put_lin(f"{p}.attn_proj", blk["attn_proj"]["weight"])
        if "scale" in blk["norm3"]:
            out[f"{p}.norm3.weight"] = np.asarray(blk["norm3"]["scale"],
                                                  np.float32)
        put_lin(f"{p}.mlp.0", blk["mlp"]["fc1"]["weight"],
                blk["mlp"]["fc1"]["bias"])
        put_lin(f"{p}.mlp.2", blk["mlp"]["fc2"]["weight"],
                blk["mlp"]["fc2"]["bias"])
        put_lin(f"{p}.adaLN_modulation.1", blk["adaLN_modulation"]["weight"],
                blk["adaLN_modulation"]["bias"])
        if "lambda_param" in blk:
            out[f"{p}.lambda_param"] = np.asarray(blk["lambda_param"],
                                                  np.float32)
        if "q_cross" in blk:
            if "scale" in blk.get("norm2", {}):
                out[f"{p}.norm2.weight"] = np.asarray(blk["norm2"]["scale"],
                                                      np.float32)
            put_lin(f"{p}.q_cross", blk["q_cross"]["weight"],
                    blk["q_cross"].get("bias"))
            put_lin(f"{p}.context_kv", blk["context_kv"]["weight"],
                    blk["context_kv"].get("bias"))
            put_lin(f"{p}.cross_proj", blk["cross_proj"]["weight"])
    return out
